"""Static driver-contract checks, no Spark session: every queries() entry
has an oracle_sql() twin (the 100%-oracle invariant the round reports
rely on), and every oracle SQL string at least PARSES in DuckDB against
empty views of the driver's table set — catching label typos, stray
commas, and engine-specific syntax before the full gate runs."""

import duckdb
import pytest

import __spark_entry__ as em

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# minimal column sets the oracles reference, mirrored from TESTDATA.md
_SCHEMAS = {
    "region": "r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR",
    "nation": "n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, "
              "n_comment VARCHAR",
    "customer": "c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, "
                "c_nationkey BIGINT, c_phone VARCHAR, c_acctbal DOUBLE, "
                "c_mktsegment VARCHAR, c_comment VARCHAR",
    "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, "
                "s_nationkey BIGINT, s_phone VARCHAR, s_acctbal DOUBLE, "
                "s_comment VARCHAR",
    "part": "p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, "
            "p_brand VARCHAR, p_type VARCHAR, p_size INT, "
            "p_container VARCHAR, p_retailprice DOUBLE, p_comment VARCHAR",
    "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
              "o_totalprice DOUBLE, o_orderdate DATE, "
              "o_orderpriority VARCHAR, o_clerk VARCHAR, "
              "o_shippriority INT, o_comment VARCHAR",
    "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
                "l_linenumber INT, l_quantity DOUBLE, "
                "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
                "l_returnflag VARCHAR, l_linestatus VARCHAR, "
                "l_shipdate DATE, l_commitdate DATE, l_receiptdate DATE, "
                "l_shipinstruct VARCHAR, l_shipmode VARCHAR, "
                "l_comment VARCHAR",
    "events": "event_id BIGINT, user_id BIGINT, event_type VARCHAR, "
              "ts TIMESTAMP, value DOUBLE, props VARCHAR",
    "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                 "source VARCHAR, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
}


# the driver's CORRECTNESS artifact records only the FIRST 50 queries()
# entries; every SURVEY §2 reference operator currently sits inside that
# window. Pinning the prefix keeps the driver-visible set stable across
# rounds — new queries APPEND, never reorder.
_FIRST_50 = [
    "xml_scan_filter", "xml_pushdown", "xml_agg_q1", "xml_join_agg",
    "xml_rollup", "xml_window_rank", "xml_sort_limit",
    "xml_distinct_except", "xml_pivot", "xml_exists_join",
    "xml_grouping_sets", "xml_scalar_subquery", "xml_explode_nested",
    "xml_flatten", "xml_attributes", "xml_valuetag", "xml_nulls",
    "xml_wildcard", "xml_partitioned", "xml_split_scan", "xml_ddl_sql",
    "from_xml_parse", "from_xml_corrupt", "from_xml_string",
    "to_xml_generate", "schema_infer", "xsd_schema", "xsd_validate",
    "stream_xml_ingest", "stream_backpressure", "stream_sessionize",
    "stream_enrich", "stream_windowed", "stream_xml_sink", "stream_dedup",
    "stream_simhash", "ann_ivf_topk", "dedup_exact", "dedup_clusters",
    "dedup_jaccard", "dedup_minhash", "dedup_near_keep", "dedup_simhash",
    "dedup_embedding", "text_quality", "text_filter_pipeline",
    "ann_cosine_topk", "ann_lsh_topk", "ann_knn_join", "ann_ivf_knn",
]


def test_first_50_query_keys_pinned():
    got = list(em.queries())[:50]
    assert got == _FIRST_50, (
        "the first 50 queries() keys changed — the driver's CORRECTNESS "
        "artifact truncates at 50, so reordering hides operators from "
        f"the gate. Diff: {[(a, b) for a, b in zip(got, _FIRST_50) if a != b]}"
    )


def test_every_query_has_an_oracle():
    q, o = set(em.queries()), set(em.oracle_sql())
    assert q == o, (
        f"missing oracles: {sorted(q - o)}; orphan oracles: {sorted(o - q)}"
    )


@pytest.mark.parametrize("name", sorted(em.oracle_sql()))
def test_oracle_sql_parses_in_duckdb(name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"(SELECT {_fake_row(t)}) WHERE 1=0"
        )
    sql = em.oracle_sql()[name]
    # EXPLAIN parses, binds names, and type-checks without executing —
    # empty views make any full execution cheap anyway
    con.execute("EXPLAIN " + sql)


def _fake_row(t: str) -> str:
    cols = []
    for spec in _SCHEMAS[t].split(","):
        cname, ctype = spec.strip().split(" ", 1)
        cols.append(f"CAST(NULL AS {ctype}) AS {cname}")
    return ", ".join(cols)


def test_scale_doc_covers_every_query():
    """SCALE.md is the per-operator 100 TB contract sheet; every
    queries() key must appear in it (backtick-quoted) so a new operator
    cannot land without a documented scale contract."""
    import os

    import __spark_entry__ as em

    doc_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "SCALE.md")
    with open(doc_path) as fh:
        doc = fh.read()
    missing = [q for q in em.queries() if f"`{q}`" not in doc]
    assert not missing, f"SCALE.md lacks contracts for: {missing}"
