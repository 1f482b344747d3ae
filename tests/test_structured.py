"""Structured-data extraction (operators/structured.py): JSON-LD,
microdata and RDFa Lite lifted from HTML into typed triples — the WDC
stage upstream of the reference's RDF store path
(`/root/reference/src/graphs.rs:30-61`). Output uses the repo's shared
term convention: literal iff obj_dt/obj_lang set, plain literals
xsd:string, IRIs both-NULL — directly composable with
sources/nquads.py and the versioned changelog."""

from __future__ import annotations

from rdf_diff_store_spark.operators.structured import (
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    extract_jsonld,
    extract_microdata,
    extract_rdfa,
    jsonld_triples_of_page,
    microdata_triples_of_page,
    rdfa_triples_of_page,
)

S = XSD_STRING
NOIRI = (None, None)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


class TestJsonldFlatten:
    def test_basic_node_with_id(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@id":"https://x.org/1",'
                '"@type":"Article","name":"n1","wordCount":42}'
            ]
        )
        assert ("https://x.org/1", RDF_TYPE, "https://schema.org/Article", *NOIRI) in t
        assert ("https://x.org/1", "https://schema.org/name", "n1", S, None) in t
        assert (
            "https://x.org/1",
            "https://schema.org/wordCount",
            "42",
            XSD_INTEGER,
            None,
        ) in t

    def test_nested_object_gets_blank_node_and_link(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@id":"https://x.org/1",'
                '"author":{"@type":"Person","name":"ada"}}'
            ]
        )
        assert ("https://x.org/1", "https://schema.org/author", "_:b0", *NOIRI) in t
        assert ("_:b0", RDF_TYPE, "https://schema.org/Person", *NOIRI) in t
        assert ("_:b0", "https://schema.org/name", "ada", S, None) in t

    def test_missing_id_allocates_sequential_blanks(self):
        t = jsonld_triples_of_page(['{"name":"a"}', '{"name":"b"}'])
        assert ("_:b0", "https://schema.org/name", "a", S, None) in t
        assert ("_:b1", "https://schema.org/name", "b", S, None) in t

    def test_graph_array_and_list_values(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@graph":['
                '{"@id":"https://x.org/a","keywords":["k1","k2"]},'
                '{"@id":"https://x.org/b","name":"bb"}]}'
            ]
        )
        assert ("https://x.org/a", "https://schema.org/keywords", "k1", S, None) in t
        assert ("https://x.org/a", "https://schema.org/keywords", "k2", S, None) in t
        assert ("https://x.org/b", "https://schema.org/name", "bb", S, None) in t

    def test_context_dict_vocab_and_prefix(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":{"@vocab":"https://v.org/ns#","dc":"http://purl.org/dc/"},'
                '"@id":"https://x.org/1","title":"t","dc:creator":"c"}'
            ]
        )
        assert ("https://x.org/1", "https://v.org/ns#title", "t", S, None) in t
        assert ("https://x.org/1", "http://purl.org/dc/creator", "c", S, None) in t

    def test_value_wrapper_lang_datatype_bool_null(self):
        t = jsonld_triples_of_page(
            [
                '{"@id":"https://x.org/1",'
                '"a":{"@value":"v","@language":"en"},'
                '"b":true,"c":null,"d":1.5}'
            ]
        )
        assert ("https://x.org/1", "https://schema.org/a", "v", None, "en") in t
        assert ("https://x.org/1", "https://schema.org/b", "true", XSD_BOOLEAN, None) in t
        assert ("https://x.org/1", "https://schema.org/d", "1.5", XSD_DOUBLE, None) in t
        assert not any(p.endswith("/c") for _, p, _, _, _ in t)

    def test_value_wrapper_typed_datatype_expansion(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":{"xsd":"http://www.w3.org/2001/XMLSchema#"},'
                '"@id":"https://x.org/1",'
                '"when":{"@value":"2024-01-01","@type":"xsd:date"}}'
            ]
        )
        assert (
            "https://x.org/1",
            "https://schema.org/when",
            "2024-01-01",
            XSD_DATE,
            None,
        ) in t

    def test_malformed_block_skipped_others_survive(self):
        t = jsonld_triples_of_page(
            ['{"name": BROKEN', '{"@id":"https://x.org/1","name":"ok"}']
        )
        assert t == [("https://x.org/1", "https://schema.org/name", "ok", S, None)]

    def test_top_level_list_and_absolute_iri_key(self):
        t = jsonld_triples_of_page(
            ['[{"@id":"https://x.org/1","https://p.org/q":"v"}]']
        )
        assert t == [("https://x.org/1", "https://p.org/q", "v", S, None)]


class TestJsonldSpark:
    def test_extraction_and_prefilter(self, spark):
        pages = _pages(
            spark,
            [
                (
                    "u1",
                    '<html><head><SCRIPT type="application/ld+json">'
                    '{"@id":"https://x.org/1","name":"one"}</SCRIPT>'
                    '<script type="application/ld+json">{"@id":"https://x.org/2",'
                    '"name":"two"}</script></head><body>x</body></html>',
                ),
                ("u2", "<html><body>no structured data</body></html>"),
                (
                    "u3",
                    "<script async type='application/ld+json'>"
                    '{"@type":"Thing"}</script>',
                ),
            ],
        )
        got = {tuple(r) for r in extract_jsonld(pages).collect()}
        assert ("u1", "https://x.org/1", "https://schema.org/name", "one", S, None) in got
        assert ("u1", "https://x.org/2", "https://schema.org/name", "two", S, None) in got
        assert ("u3", "_:b0", RDF_TYPE, "https://schema.org/Thing", None, None) in got
        assert not any(r[0] == "u2" for r in got)

    def test_single_arrow_hop_no_shuffle_after(self, spark):
        pages = _pages(spark, [("u", "x")])
        plan = extract_jsonld(pages)._jdf.queryExecution().toString()
        assert plan.count("MapInPandas") >= 1
        assert "ArrowEvalPython" not in plan

    def test_feeds_nquads_sink_directly(self, spark):
        """Extractor output in the shared term convention serializes
        through sources/nquads.py with no adaptation, and parses back
        to the same terms."""
        from pyspark.sql import functions as F

        from rdf_diff_store_spark.sources.nquads import (
            parse_nquads,
            serialize_nquads,
        )

        pages = _pages(
            spark,
            [
                (
                    "https://x.org/page",
                    '<script type="application/ld+json">'
                    '{"@id":"https://x.org/1","name":"n","wordCount":7,'
                    '"label":{"@value":"bonjour","@language":"fr"}}</script>',
                )
            ],
        )
        triples = extract_jsonld(pages).withColumnRenamed("url", "graph_id")
        lines = serialize_nquads(triples)
        back = parse_nquads(lines.select(F.col("line").alias("value")))
        orig = {
            tuple(r)
            for r in triples.select(
                "graph_id", "subj", "pred", "obj", "obj_dt", "obj_lang"
            ).collect()
        }
        got = {tuple(r) for r in back.collect()}
        assert got == orig and len(got) == 3


class TestMicrodata:
    HTML = (
        '<div itemscope itemtype="https://schema.org/Product" '
        'itemid="https://x.org/p1">'
        '<span itemprop="name">item <b>one</b> !</span>'
        '<meta itemprop="sku" content="SKU-1">'
        '<a itemprop="url" href="https://x.org/1">link</a>'
        '<div itemprop="offers" itemscope itemtype="https://schema.org/Offer">'
        '<span itemprop="price">9.00</span></div>'
        "</div>"
    )

    def test_full_item(self):
        t = microdata_triples_of_page(self.HTML)
        s = "https://x.org/p1"
        assert (s, RDF_TYPE, "https://schema.org/Product", *NOIRI) in t
        assert (s, "https://schema.org/name", "item one !", S, None) in t
        assert (s, "https://schema.org/sku", "SKU-1", S, None) in t
        assert (s, "https://schema.org/url", "https://x.org/1", *NOIRI) in t
        assert (s, "https://schema.org/offers", "_:md0", *NOIRI) in t
        assert ("_:md0", RDF_TYPE, "https://schema.org/Offer", *NOIRI) in t
        assert ("_:md0", "https://schema.org/price", "9.00", S, None) in t

    def test_multiple_prop_names_and_time_sniffing(self):
        t = microdata_triples_of_page(
            '<div itemscope><time itemprop="datePublished dateModified" '
            'datetime="2024-01-01">Jan 1</time>'
            '<time itemprop="exact" datetime="2024-01-01T10:30:00Z">x</time>'
            '<time itemprop="loose" datetime="P3D">3 days</time></div>'
        )
        assert (
            "_:md0",
            "https://schema.org/datePublished",
            "2024-01-01",
            XSD_DATE,
            None,
        ) in t
        assert (
            "_:md0",
            "https://schema.org/dateModified",
            "2024-01-01",
            XSD_DATE,
            None,
        ) in t
        assert (
            "_:md0",
            "https://schema.org/exact",
            "2024-01-01T10:30:00Z",
            XSD_DATETIME,
            None,
        ) in t
        assert ("_:md0", "https://schema.org/loose", "P3D", S, None) in t

    def test_vocab_from_hash_itemtype(self):
        t = microdata_triples_of_page(
            '<div itemscope itemtype="https://v.org/ns#Thing">'
            '<span itemprop="p">v</span></div>'
        )
        assert ("_:md0", "https://v.org/ns#p", "v", S, None) in t

    def test_absolute_itemprop_and_no_itemtype_default_vocab(self):
        t = microdata_triples_of_page(
            '<div itemscope><span itemprop="https://p.org/q">v</span>'
            '<span itemprop="name">n</span></div>'
        )
        assert ("_:md0", "https://p.org/q", "v", S, None) in t
        assert ("_:md0", "https://schema.org/name", "n", S, None) in t

    def test_sibling_items_and_truncated_html(self):
        t = microdata_triples_of_page(
            '<div itemscope><span itemprop="name">a</span></div>'
            '<div itemscope><span itemprop="name">b'  # unclosed
        )
        assert ("_:md0", "https://schema.org/name", "a", S, None) in t
        assert ("_:md1", "https://schema.org/name", "b", S, None) in t

    def test_itemprop_outside_any_item_ignored(self):
        assert microdata_triples_of_page('<span itemprop="name">x</span>') == []

    def test_spark_extraction(self, spark):
        pages = _pages(
            spark,
            [("u1", self.HTML), ("u2", "<p>plain</p>")],
        )
        got = extract_microdata(pages).collect()
        assert {r["url"] for r in got} == {"u1"}
        assert len(got) == 7


class TestRdfa:
    def test_og_meta_tags_use_document_subject(self):
        t = rdfa_triples_of_page(
            "https://x.org/p",
            '<html><head><meta property="og:title" content="T">'
            '<meta property="og:type" content="article"></head></html>',
        )
        assert ("https://x.org/p", "http://ogp.me/ns#title", "T", S, None) in t
        assert ("https://x.org/p", "http://ogp.me/ns#type", "article", S, None) in t

    def test_prefix_attr_overrides_initial_context(self):
        t = rdfa_triples_of_page(
            "u",
            '<html prefix="og: https://my.og/ns#">'
            '<meta property="og:title" content="T"></html>',
        )
        assert ("u", "https://my.og/ns#title", "T", S, None) in t

    def test_vocab_typeof_resource_and_chaining(self):
        t = rdfa_triples_of_page(
            "u",
            '<body vocab="https://schema.org/" typeof="Article"'
            ' resource="https://x.org/1#it">'
            '<span property="name">doc</span>'
            '<a property="url" href="https://x.org/1">x</a>'
            '<div property="author" typeof="Person">'
            '<span property="name">ada</span></div></body>',
        )
        it = "https://x.org/1#it"
        assert (it, RDF_TYPE, "https://schema.org/Article", *NOIRI) in t
        assert (it, "https://schema.org/name", "doc", S, None) in t
        assert (it, "https://schema.org/url", "https://x.org/1", *NOIRI) in t
        assert (it, "https://schema.org/author", "_:r0", *NOIRI) in t
        assert ("_:r0", RDF_TYPE, "https://schema.org/Person", *NOIRI) in t
        assert ("_:r0", "https://schema.org/name", "ada", S, None) in t

    def test_bare_term_without_vocab_dropped(self):
        assert rdfa_triples_of_page("u", '<span property="name">x</span>') == []

    def test_resource_valued_property_and_about(self):
        t = rdfa_triples_of_page(
            "u",
            '<div vocab="https://schema.org/" about="https://x.org/a">'
            '<link property="sameAs" resource="https://x.org/b">'
            '<span property="name">n</span></div>',
        )
        assert (
            "https://x.org/a",
            "https://schema.org/sameAs",
            "https://x.org/b",
            *NOIRI,
        ) in t
        assert ("https://x.org/a", "https://schema.org/name", "n", S, None) in t

    def test_vocab_scope_ends_with_element(self):
        t = rdfa_triples_of_page(
            "u",
            '<div vocab="https://v.org/"><span property="p">a</span></div>'
            '<span property="q">b</span>',
        )
        assert ("u", "https://v.org/p", "a", S, None) in t
        assert not any(p.endswith("q") for _, p, _, _, _ in t)

    def test_spark_extraction_and_prefilter(self, spark):
        pages = _pages(
            spark,
            [
                ("u1", '<meta property="og:title" content="T">'),
                ("u2", "<p>nothing here</p>"),
            ],
        )
        got = [tuple(r) for r in extract_rdfa(pages).collect()]
        assert got == [("u1", "u1", "http://ogp.me/ns#title", "T", S, None)]


class TestSkolemize:
    """RDF 1.1 §3.5 Skolem IRIs over extractor output: per-page blank
    labels become globally unique, merge-safe IRIs."""

    def _t(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "url string, subj string, pred string, obj string, "
            "obj_dt string, obj_lang string",
        )

    def test_same_label_different_pages_diverge(self, spark):
        from rdf_diff_store_spark.operators.structured import (
            SKOLEM_PREFIX,
            skolemize,
        )

        df = skolemize(
            self._t(
                spark,
                [
                    ("u1", "_:b0", "p", "x", XSD_STRING, None),
                    ("u2", "_:b0", "p", "x", XSD_STRING, None),
                ],
            )
        )
        subjs = [r["subj"] for r in df.collect()]
        assert subjs[0] != subjs[1]
        assert all(s.startswith(SKOLEM_PREFIX) for s in subjs)

    def test_within_page_coreference_preserved(self, spark):
        from rdf_diff_store_spark.operators.structured import skolemize

        rows = skolemize(
            self._t(
                spark,
                [
                    ("u1", "s", "author", "_:b0", None, None),
                    ("u1", "_:b0", "name", "ada", XSD_STRING, None),
                ],
            )
        ).collect()
        link_obj = next(r for r in rows if r["pred"] == "author")["obj"]
        node_subj = next(r for r in rows if r["pred"] == "name")["subj"]
        assert link_obj == node_subj and not link_obj.startswith("_:")

    def test_literal_lexically_blank_untouched(self, spark):
        from rdf_diff_store_spark.operators.structured import skolemize

        rows = skolemize(
            self._t(spark, [("u1", "s", "code", "_:b0", XSD_STRING, None)])
        ).collect()
        assert rows[0]["obj"] == "_:b0"  # it's a LITERAL, not a node

    def test_iris_and_literals_pass_through(self, spark):
        from rdf_diff_store_spark.operators.structured import skolemize

        src = [
            ("u1", "https://x.org/1", "name", "hello", XSD_STRING, None),
            ("u1", "https://x.org/1", "see", "https://y.org/2", None, None),
        ]
        assert sorted(map(tuple, skolemize(self._t(spark, src)).collect())) == sorted(
            src
        )

    def test_plan_is_jvm_map_only(self, spark):
        from rdf_diff_store_spark.operators.structured import skolemize

        plan = skolemize(
            self._t(spark, [("u1", "_:b0", "p", "_:b1", None, None)])
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "InPandas" not in plan

    def test_composes_with_extractor(self, spark):
        from rdf_diff_store_spark.operators.structured import skolemize

        html = (
            '<html><head><script type="application/ld+json">'
            '{"@context":"https://schema.org","@id":"https://x.org/1",'
            '"author":{"@type":"Person","name":"ada"}}'
            "</script></head></html>"
        )
        pages = _pages(spark, [("u1", html), ("u2", html)])
        out = skolemize(extract_jsonld(pages)).collect()
        assert not any(
            r["subj"].startswith("_:")
            or (r["obj"].startswith("_:") and r["obj_dt"] is None)
            for r in out
        )
        # u1's author node != u2's author node
        authors = {r["obj"] for r in out if r["pred"].endswith("author")}
        assert len(authors) == 2


class TestJsonldList:
    """JSON-LD @list → rdf:first/rdf:rest collection chains
    (JSON-LD 1.1 §4.3.1, RDF 1.1 Concepts §3.4)."""

    RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
    RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
    RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

    def test_scalar_list_chain(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@id":"https://x.org/1",'
                '"itemListElement":{"@list":["a","b"]}}'
            ]
        )
        link = next(x for x in t if x[1].endswith("itemListElement"))
        head = link[2]
        assert head.startswith("_:") and link[3] is None
        assert (head, self.RDF_FIRST, "a", S, None) in t
        rest = next(x for x in t if x[0] == head and x[1] == self.RDF_REST)
        cell2 = rest[2]
        assert (cell2, self.RDF_FIRST, "b", S, None) in t
        assert (cell2, self.RDF_REST, self.RDF_NIL, *NOIRI) in t

    def test_empty_and_null_only_list_is_nil(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@id":"https://x.org/1",'
                '"a":{"@list":[]},"b":{"@list":[null,{"@value":null}]}}'
            ]
        )
        assert ("https://x.org/1", "https://schema.org/a", self.RDF_NIL, *NOIRI) in t
        assert ("https://x.org/1", "https://schema.org/b", self.RDF_NIL, *NOIRI) in t
        assert not any(x[1] == self.RDF_FIRST for x in t)

    def test_list_of_typed_values_and_nodes(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@id":"https://x.org/1",'
                '"stops":{"@list":[{"@value":"hei","@language":"no"},'
                '{"@type":"Place","name":"Oslo"},7]}}'
            ]
        )
        firsts = [x for x in t if x[1] == self.RDF_FIRST]
        assert len(firsts) == 3
        assert ("hei", None, "no") in {(x[2], x[3], x[4]) for x in firsts}
        assert ("7", XSD_INTEGER, None) in {(x[2], x[3], x[4]) for x in firsts}
        # the node member is typed and named under its own blank subject
        place = next(
            x[2] for x in firsts if x[3] is None and x[4] is None and x[2].startswith("_:")
        )
        assert (place, RDF_TYPE, "https://schema.org/Place", *NOIRI) in t
        # chain terminates
        rests = [x for x in t if x[1] == self.RDF_REST]
        assert sum(1 for x in rests if x[2] == self.RDF_NIL) == 1

    def test_list_cells_skolemize(self, spark):
        from rdf_diff_store_spark.operators.structured import skolemize

        html = (
            '<html><head><script type="application/ld+json">'
            '{"@context":"https://schema.org","@id":"https://x.org/1",'
            '"steps":{"@list":["x","y"]}}'
            "</script></head></html>"
        )
        out = skolemize(extract_jsonld(_pages(spark, [("u1", html)]))).collect()
        assert not any(
            r["subj"].startswith("_:")
            or (r["obj"].startswith("_:") and r["obj_dt"] is None)
            for r in out
        )
        # chain still linked after skolemization
        link = next(r for r in out if r["pred"].endswith("steps"))
        assert any(
            r["subj"] == link["obj"] and r["pred"] == self.RDF_FIRST for r in out
        )


class TestLanguageTags:
    """In-scope lang/xml:lang flows onto text-valued literals
    (microdata-to-RDF §2.3, RDFa Core §7.5 current language)."""

    def test_microdata_inherited_and_local_lang(self):
        t = microdata_triples_of_page(
            '<html lang="en"><body>'
            '<div itemscope itemtype="https://schema.org/Book">'
            '<span itemprop="name">Sult</span>'
            '<span itemprop="alternateName" lang="no">Sulten</span>'
            '<span itemprop="isbn" lang="">123</span>'
            '<meta itemprop="bookEdition" content="1st">'
            '<time itemprop="datePublished" datetime="1890-01-01">1890</time>'
            "</div></body></html>"
        )
        vals = {x[1].rsplit("/", 1)[-1]: (x[2], x[3], x[4]) for x in t if x[1] != RDF_TYPE}
        assert vals["name"] == ("Sult", None, "en")  # inherited from <html>
        assert vals["alternateName"] == ("Sulten", None, "no")  # local override
        assert vals["isbn"] == ("123", XSD_STRING, None)  # lang="" resets
        assert vals["bookEdition"] == ("1st", None, "en")  # meta content too
        assert vals["datePublished"] == ("1890-01-01", XSD_DATE, None)  # typed wins

    def test_rdfa_lang_on_content_and_text(self):
        t = rdfa_triples_of_page(
            "https://x.org/p",
            '<html lang="en"><head>'
            '<meta property="og:title" content="Hello">'
            "</head><body>"
            '<p vocab="https://schema.org/" typeof="Person">'
            '<span property="name" xml:lang="no">Ola</span>'
            '<span property="email">x@y.z</span></p>'
            "</body></html>",
        )
        vals = {x[1].rsplit("/", 1)[-1].rsplit("#", 1)[-1]: (x[2], x[3], x[4])
                for x in t if x[1] != RDF_TYPE}
        assert vals["title"] == ("Hello", None, "en")
        assert vals["name"] == ("Ola", None, "no")  # xml:lang wins
        assert vals["email"] == ("x@y.z", None, "en")  # inherited

    def test_no_lang_stays_plain_string(self):
        t = microdata_triples_of_page(
            '<div itemscope><span itemprop="name">x</span></div>'
        )
        assert t == [("_:md0", "https://schema.org/name", "x", XSD_STRING, None)]


class TestReviewFixes:
    def test_value_wrapper_nonscalar_is_string_not_integer(self):
        t = jsonld_triples_of_page(
            ['{"@id":"https://x.org/1","p":{"@value":[1,2]}}']
        )
        assert t == [("https://x.org/1", "https://schema.org/p", "[1, 2]", S, None)]

    def test_time_duration_never_language_tagged(self):
        t = microdata_triples_of_page(
            '<div itemscope lang="en">'
            '<time itemprop="duration" datetime="PT2H30M">2.5h</time></div>'
        )
        assert t == [
            ("_:md0", "https://schema.org/duration", "PT2H30M", XSD_STRING, None)
        ]

    def test_uppercase_prefilters(self, spark):
        html_md = '<DIV ITEMSCOPE><SPAN ITEMPROP="name">x</SPAN></DIV>'
        rows = extract_microdata(_pages(spark, [("u", html_md)])).collect()
        assert len(rows) == 1 and rows[0]["obj"] == "x"


class TestJsonldReverse:
    """JSON-LD §4.8 @reverse: the referenced nodes point AT this one."""

    def test_reverse_node_and_iri(self):
        t = jsonld_triples_of_page(
            [
                '{"@context":"https://schema.org","@id":"https://x.org/bob",'
                '"@reverse":{"knows":[{"@id":"https://x.org/alice"},'
                '{"@type":"Person","name":"carol"}]}}'
            ]
        )
        assert (
            "https://x.org/alice",
            "https://schema.org/knows",
            "https://x.org/bob",
            *NOIRI,
        ) in t
        carol = next(x[0] for x in t if x[1].endswith("name"))
        assert (carol, "https://schema.org/knows", "https://x.org/bob", *NOIRI) in t
        assert (carol, RDF_TYPE, "https://schema.org/Person", *NOIRI) in t

    def test_reverse_string_shorthand(self):
        t = jsonld_triples_of_page(
            [
                '{"@id":"https://x.org/1",'
                '"@reverse":{"https://schema.org/about":"https://x.org/page"}}'
            ]
        )
        assert t == [
            ("https://x.org/page", "https://schema.org/about", "https://x.org/1", None, None)
        ]
