"""SQL surface parity: spark.sql templates == DataFrame operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.topk import topk_search
from astro_vectordb_spark.sql import register_tables, run_topk


def test_sql_topk_matches_dataframe_api(spark, embeddings, sf_dir):
    register_tables(spark, sf_dir)
    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    via_sql = run_topk(spark, qv, k=10, threshold=0.2).collect()
    via_df = (
        topk_search(embeddings, qv, k=10, strength=20)
        .select("vec_id", "score")
        .collect()
    )
    assert [(r["vec_id"], r["score"]) for r in via_sql] == [
        (r["vec_id"], r["score"]) for r in via_df
    ]


def test_register_tables_all_present(spark, sf_dir):
    register_tables(spark, sf_dir)
    names = {r["viewName"] for r in spark.sql("SHOW VIEWS").collect()}
    for t in ["embeddings", "documents", "lineitem", "events"]:
        assert t in names
    n = spark.sql("SELECT count(*) c FROM lineitem").first()["c"]
    assert n > 0


def test_driver_contract_ordering_and_coverage():
    """The driver checks the FIRST 50 queries() entries against
    oracle_sql().  With more than 50 oracled queries (since round 6)
    the window cannot cover them all — the full gate
    (scripts/check_oracle.py) covers the rest — but every slot of the
    window must still be spent on a hash-checkable query.  Pin:
    (a) the first 50 entries are ALL oracled (no rows-only query
    wastes a window slot), (b) oracled entries form a contiguous
    prefix ahead of every rows-only entry, (c) oracle keys and
    queries() keys agree."""
    import __spark_entry__ as m

    qs = list(m.queries())
    oracles = set(m.oracle_sql())
    n_oracled = len(oracles)
    assert oracles <= set(qs), f"orphan oracles: {oracles - set(qs)}"
    assert set(qs[:min(50, n_oracled)]) <= oracles, (
        "a rows-only query occupies a driver-window slot: "
        f"{set(qs[:min(50, n_oracled)]) - oracles}"
    )
    assert set(qs[:n_oracled]) == oracles, (
        "oracled queries must form the prefix of queries(): misplaced "
        f"= {oracles.symmetric_difference(qs[:n_oracled])}"
    )
    assert all(name not in oracles for name in qs[n_oracled:])


def test_bench_tail_line_fits_driver_capture():
    """The driver records a 2000-char stdout TAIL; bench.py's final
    line must carry the FULL per-query map inside it.  Static check at
    the leanest emission form (1 decimal, ints for whole values, no
    unit field) with pessimistic 9.9-second values for every query —
    if this fails, the next driver BENCH artifact front-truncates and
    round-over-round regression analysis silently degrades."""
    import json

    import __spark_entry__ as m

    names = list(m.queries())
    # bench.py's last-resort packed stage: metric + value + the short
    # "qp" map key (unit/sf live on the full-fidelity first line and
    # in the local artifact), values at the FINAL compaction notch:
    # leading zero stripped below 1 s (":.9", 2 chars), whole seconds
    # for everything >= 1 s — worst remaining case is every query at
    # two-digit whole seconds (":99")
    head = {
        "value": 999.9,
        "qp": " ".join(f"{k}:99" for k in names),
    }
    line = json.dumps(head, separators=(",", ":"))
    assert len(line) <= 1980, (
        f"densest bench tail {len(line)} chars > 1980 budget for "
        f"{len(names)} queries — shorten names or add a leaner "
        "emission stage in bench.py"
    )
