"""WebTables relation extraction (operators/tables.py): HTML tables →
relational cells → typed triples, the third structured-data channel
next to JSON-LD/microdata/RDFa. Upstream of the reference's store path
(`/root/reference/src/graphs.rs:30-61`)."""

from __future__ import annotations

from rdf_diff_store_spark.operators.structured import (
    XSD_INTEGER,
    XSD_STRING,
    skolemize,
)
from rdf_diff_store_spark.operators.tables import (
    extract_table_cells,
    table_cells_of_page,
    table_cells_to_triples,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


class TestTableParser:
    def test_th_header_row(self):
        c = table_cells_of_page(
            "<table><tr><th>Name</th><th>Age</th></tr>"
            "<tr><td>ada</td><td>36</td></tr>"
            "<tr><td>alan</td><td>41</td></tr></table>"
        )
        assert (0, 0, 0, "Name", "ada") in c
        assert (0, 0, 1, "Age", "36") in c
        assert (0, 1, 0, "Name", "alan") in c
        assert len(c) == 4  # header row itself emits no cells

    def test_no_th_synthetic_headers(self):
        c = table_cells_of_page(
            "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
        )
        assert (0, 0, 0, "col0", "a") in c
        assert (0, 1, 1, "col1", "d") in c
        assert len(c) == 4  # first row is DATA when not all-th

    def test_mixed_first_row_is_data(self):
        c = table_cells_of_page(
            "<table><tr><th>k</th><td>v</td></tr></table>"
        )
        assert (0, 0, 0, "col0", "k") in c
        assert (0, 0, 1, "col1", "v") in c

    def test_header_colspan_expands(self):
        c = table_cells_of_page(
            '<table><tr><th colspan="2">Span</th><th>C</th></tr>'
            "<tr><td>x</td><td>y</td><td>z</td></tr></table>"
        )
        assert (0, 0, 0, "Span", "x") in c
        assert (0, 0, 1, "Span", "y") in c
        assert (0, 0, 2, "C", "z") in c

    def test_data_colspan_repeats_value(self):
        c = table_cells_of_page(
            "<table><tr><th>A</th><th>B</th></tr>"
            '<tr><td colspan="2">wide</td></tr></table>'
        )
        assert (0, 0, 0, "A", "wide") in c
        assert (0, 0, 1, "B", "wide") in c

    def test_nested_table_is_separate_and_does_not_leak(self):
        c = table_cells_of_page(
            "<table><tr><th>Out</th></tr><tr><td>before "
            "<table><tr><td>inner</td></tr></table>"
            " after</td></tr></table>"
        )
        # inner table gets its own idx (document order: outer=0, inner=1)
        assert (1, 0, 0, "col0", "inner") in c
        outer = next(x for x in c if x[0] == 0)
        assert outer[4] == "before after"

    def test_whitespace_and_entities(self):
        c = table_cells_of_page(
            "<table><tr><td>  a &amp;\n  b  </td></tr></table>"
        )
        assert c == [(0, 0, 0, "col0", "a & b")]

    def test_script_text_skipped_br_is_space(self):
        c = table_cells_of_page(
            "<table><tr><td>x<br>y<script>var t=1;</script></td></tr></table>"
        )
        assert c == [(0, 0, 0, "col0", "x y")]

    def test_unclosed_table_still_emits(self):
        c = table_cells_of_page("<table><tr><td>tail</td>")
        assert c == [(0, 0, 0, "col0", "tail")]

    def test_multiple_tables_document_order(self):
        c = table_cells_of_page(
            "<p>t</p><table><tr><td>a</td></tr></table>"
            "<div><table><tr><td>b</td></tr></table></div>"
        )
        assert (0, 0, 0, "col0", "a") in c and (1, 0, 0, "col0", "b") in c

    def test_empty_and_malformed(self):
        assert table_cells_of_page("<table></table>") == []
        assert table_cells_of_page("no tables here") == []


class TestExtractTableCellsSpark:
    def test_end_to_end_and_plan(self, spark):
        pages = _pages(
            spark,
            [
                (
                    "u1",
                    "<html><body><table><tr><th>Name</th></tr>"
                    "<tr><td>ada</td></tr></table></body></html>",
                ),
                ("u2", "<html><body>no table</body></html>"),
            ],
        )
        df = extract_table_cells(pages)
        rows = df.collect()
        assert [tuple(r) for r in rows] == [("u1", 0, 0, 0, "Name", "ada")]
        import re

        # AQE prints Final + Initial sections — count in the final only
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert plan.count("MapInPandas") >= 1
        # exactly the one explicit parse-parallelism repartition
        assert len(re.findall(r"Exchange RoundRobinPartitioning", plan)) <= 1
        assert "Exchange hashpartitioning" not in plan


class TestCellsToTriples:
    def _cells(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "url string, table_idx int, row_idx int, col_idx int, "
            "header string, value string",
        )

    def test_typing_slug_and_blank_labels(self, spark):
        out = table_cells_to_triples(
            self._cells(
                spark,
                [
                    ("u", 0, 0, 0, "Release Year", "1984"),
                    ("u", 0, 0, 1, "Name!", "ada"),
                    ("u", 0, 0, 2, "Notes", ""),  # empty cell → dropped
                    ("u", 2, 5, 0, "col0", "-7"),
                ],
            )
        ).collect()
        by_pred = {r["pred"]: r for r in out}
        y = by_pred["https://schema.org/release_year"]
        assert (y["subj"], y["obj"], y["obj_dt"]) == ("_:t0r0", "1984", XSD_INTEGER)
        n = by_pred["https://schema.org/name"]
        assert (n["obj"], n["obj_dt"], n["obj_lang"]) == ("ada", XSD_STRING, None)
        assert by_pred["https://schema.org/col0"]["subj"] == "_:t2r5"
        assert by_pred["https://schema.org/col0"]["obj_dt"] == XSD_INTEGER
        assert len(out) == 3

    def test_non_integer_lexicals_stay_strings(self, spark):
        out = table_cells_to_triples(
            self._cells(
                spark,
                [
                    ("u", 0, 0, 0, "a", "1.5"),
                    ("u", 0, 0, 1, "b", "12 kg"),
                    ("u", 0, 0, 2, "c", "+3"),  # sign form not sniffed
                ],
            )
        ).collect()
        assert all(r["obj_dt"] == XSD_STRING for r in out)

    def test_composes_with_skolemize(self, spark):
        tri = table_cells_to_triples(
            self._cells(
                spark,
                [
                    ("u1", 0, 0, 0, "n", "x"),
                    ("u2", 0, 0, 0, "n", "x"),
                ],
            )
        )
        subjs = [r["subj"] for r in skolemize(tri).collect()]
        assert subjs[0] != subjs[1]
        assert not any(s.startswith("_:") for s in subjs)

    def test_lift_is_jvm_only(self, spark):
        plan = (
            table_cells_to_triples(
                self._cells(spark, [("u", 0, 0, 0, "h", "v")])
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "InPandas" not in plan


class TestReviewFixes:
    def test_uppercase_markup_passes_prefilter(self, spark):
        pages = _pages(
            spark,
            [("u1", "<HTML><BODY><TABLE><TR><TD>42</TD></TR></TABLE></BODY></HTML>")],
        )
        rows = extract_table_cells(pages).collect()
        assert [tuple(r) for r in rows] == [("u1", 0, 0, 0, "col0", "42")]

    def test_leading_spacer_row_does_not_eat_header(self):
        c = table_cells_of_page(
            "<table><tr></tr><tr><th>Name</th></tr><tr><td>ada</td></tr></table>"
        )
        assert c == [(0, 0, 0, "Name", "ada")]


class TestAlignHeaders:
    def _align(self, spark, headers, labels, max_lev=1):
        from rdf_diff_store_spark.operators.tables import align_headers

        h = spark.createDataFrame([(x,) for x in headers], ["header"])
        d = spark.createDataFrame(labels, ["label", "pred"])
        return {
            r["header"]: (r["pred"], r["distance"])
            for r in align_headers(h, d, max_lev).collect()
        }

    DICT = [("price", "s:price"), ("name", "s:name"), ("date", "s:date")]

    def test_exact_match_distance_zero(self, spark):
        got = self._align(spark, ["price", "name"], self.DICT)
        assert got == {"price": ("s:price", 0), "name": ("s:name", 0)}

    def test_one_edit_matches(self, spark):
        # deletion, insertion, substitution — all within lev 1
        got = self._align(spark, ["prce", "pricce", "pryce"], self.DICT)
        assert got == {
            "prce": ("s:price", 1),
            "pricce": ("s:price", 1),
            "pryce": ("s:price", 1),
        }

    def test_beyond_band_absent(self, spark):
        got = self._align(spark, ["pricing", "zzz"], self.DICT)
        assert got == {}

    def test_tie_breaks_to_smallest_pred(self, spark):
        labels = [("cost", "s:b_cost"), ("cast", "s:a_cast")]
        got = self._align(spark, ["cost"], labels)
        # exact match (distance 0) beats the 1-edit rival
        assert got == {"cost": ("s:b_cost", 0)}
        got2 = self._align(spark, ["cost"], [("coast", "s:b"), ("cosy", "s:a")])
        # both at distance 1: lexicographically smallest pred wins
        assert got2 == {"cost": ("s:a", 1)}

    def test_no_nested_loop_join(self, spark):
        from rdf_diff_store_spark.operators.tables import align_headers

        h = spark.createDataFrame([("price",)], ["header"])
        d = spark.createDataFrame(self.DICT, ["label", "pred"])
        plan = align_headers(h, d)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
