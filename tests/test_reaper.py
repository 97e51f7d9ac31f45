"""r14 block-hygiene gates (VERDICT r13 #2): lazy `_ckpt` localCheckpoint
blocks and per-query `.cache()` entries must be freeable DETERMINISTICALLY
at sweep boundaries — `session.reap_registered` frees what the query path
registered, and a reaped query recomputes correctly when re-built.

Also pins the r14 session-artifact memo (VERDICT r13 #1/#3): a second
invocation of a fit-heavy query in the same session must reuse the
session's fitted artifact (identity-equal model object), and its output
must be identical to the first invocation's.
"""

from __future__ import annotations

import sparkml_spark.operators  # noqa: F401 — populates the registry

from .conftest import SF_DIR


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def test_ckpt_blocks_register_and_reap(spark):
    from sparkml_spark.registry import QUERIES
    from sparkml_spark.session import persistent_rdd_count, reap_registered

    reap_registered(spark)  # clean slate (frees earlier tests' leftovers)
    base = persistent_rdd_count(spark)

    df = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    _noop(df)
    n1 = df.count()
    assert persistent_rdd_count(spark) > base, "expected _ckpt blocks to register"

    n = reap_registered(spark)
    assert n >= 1
    assert persistent_rdd_count(spark) <= base

    # a reaped query REBUILDS and recomputes correctly (fresh plan,
    # fresh checkpoints) — the reap must not poison later invocations
    df2 = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    assert df2.count() == n1
    reap_registered(spark)


def test_cache_blocks_register_and_reap(spark):
    from sparkml_spark.registry import QUERIES
    from sparkml_spark.session import persistent_rdd_count, reap_registered

    reap_registered(spark)
    base = persistent_rdd_count(spark)

    df = QUERIES["graph_label_propagation"](spark, SF_DIR)
    _noop(df)
    assert persistent_rdd_count(spark) > base, "expected round caches to register"

    reap_registered(spark)
    assert persistent_rdd_count(spark) <= base

    # unpersisted caches recompute — same census, no read-after-free
    rows = {r["label"]: r["n_nodes"] for r in df.collect()}
    assert sum(rows.values()) > 0


def test_session_artifact_memo_shares_fits(spark):
    from sparkml_spark.registry import QUERIES
    from sparkml_spark.session import _ARTIFACTS, reap_registered

    app = spark.sparkContext.applicationId
    df1 = QUERIES["ml_classify_logistic"](spark, SF_DIR)
    r1 = sorted(tuple(r) for r in df1.collect())
    keys = [k for k in _ARTIFACTS if k[0] == app and "lr25_reg01" in k]
    assert keys, "expected the lr25 fit to be memoized"
    model_first = _ARTIFACTS[keys[0]]

    # the bound twin audits the SAME fitted object, and the base query
    # rebuilt in-session reuses it — outputs identical
    df2 = QUERIES["ml_classify_logistic"](spark, SF_DIR)
    r2 = sorted(tuple(r) for r in df2.collect())
    assert _ARTIFACTS[keys[0]] is model_first
    assert r1 == r2
    bound = QUERIES["ml_fit_quality_bound"](spark, SF_DIR)
    assert [r["n_violations"] for r in bound.collect()] == [0]
    reap_registered(spark)
