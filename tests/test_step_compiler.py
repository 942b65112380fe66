"""TransformEngine step-dispatch tests: every step type through the
config-dict interface (the reference's own entry surface,
transform_engine.py:87-119), on a small fixture with hand-computed
expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_etl_framework_spark.operators import TransformEngine


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "Ann", 30, 50000.0, "IT"),
        (2, "Bob", 45, 65000.0, "IT"),
        (3, "Cid", 28, 48000.0, "HR"),
        (4, "Dee", 39, 70000.0, "HR"),
        (5, "Eve", 51, 90000.0, "Finance"),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, age long, salary double, dept string"
    )


def _run(spark, sources, steps, primary=None):
    return TransformEngine(spark).execute_transformations(
        sources, {"steps": steps, "primary_source": primary}
    )


def test_filter_step_variants(spark, people):
    out = _run(spark, {"p": people}, [
        {"type": "filter", "config": {"condition": "age > 30 AND dept = 'HR'"}}
    ])
    assert [r.id for r in out.collect()] == [4]
    out2 = _run(spark, {"p": people}, [
        {"type": "filter", "config": {"conditions": [
            {"column": "age", "operator": ">=", "value": 30},
            {"column": "salary", "operator": "<", "value": 80000.0},
        ]}}
    ])
    assert sorted(r.id for r in out2.collect()) == [1, 2, 4]


def test_map_step_derive_rename_drop_reorder(spark, people):
    out = _run(spark, {"p": people}, [
        {"type": "map", "config": {
            "derive": {"bonus": "salary * 0.1"},
            "rename": {"dept": "department"},
            "drop": ["name"],
            "reorder": ["id", "department", "salary", "bonus", "age"],
        }}
    ])
    assert out.columns == ["id", "department", "salary", "bonus", "age"]
    assert out.filter("id = 1").collect()[0].bonus == pytest.approx(5000.0)


def test_window_step_rank_lag_cumsum_rolling(spark, people):
    ranked = _run(spark, {"p": people}, [
        {"type": "window", "config": {
            "function": "dense_rank", "partition_by": ["dept"],
            "order_by": "salary", "ascending": False, "output_col": "rnk"}}
    ])
    top = {r.dept: r.id for r in ranked.filter("rnk = 1").collect()}
    assert top == {"IT": 2, "HR": 4, "Finance": 5}

    lagged = _run(spark, {"p": people}, [
        {"type": "window", "config": {
            "function": "lag", "column": "salary", "offset": 1,
            "partition_by": ["dept"], "order_by": "id", "output_col": "prev"}}
    ])
    assert lagged.filter("id = 2").collect()[0].prev == 50000.0

    cum = _run(spark, {"p": people}, [
        {"type": "window", "config": {
            "function": "running_total", "column": "salary",
            "partition_by": ["dept"], "order_by": "id", "output_col": "cum"}}
    ])
    assert cum.filter("id = 4").collect()[0].cum == pytest.approx(118000.0)

    roll = _run(spark, {"p": people}, [
        {"type": "window", "config": {
            "function": "rolling_mean", "column": "salary", "window_size": 2,
            "partition_by": [], "order_by": "id", "output_col": "ma"}}
    ])
    assert roll.filter("id = 2").collect()[0].ma == pytest.approx(57500.0)


def test_window_step_average_rank(spark):
    # pandas rank(method='average'): [10, 20, 20, 30] -> [1.0, 2.5, 2.5, 4.0]
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 20), ("a", 30), ("b", 7)], "grp string, v int"
    )
    out = _run(spark, {"p": df}, [
        {"type": "window", "config": {
            "function": "average", "partition_by": ["grp"],
            "order_by": "v", "output_col": "avg_rnk"}}
    ])
    got = sorted((r.grp, r.v, r.avg_rnk) for r in out.collect())
    assert got == [("a", 10, 1.0), ("a", 20, 2.5), ("a", 20, 2.5),
                   ("a", 30, 4.0), ("b", 7, 1.0)]


def test_join_step_resolves_right_source(spark, people):
    depts = spark.createDataFrame(
        [("IT", "Tech"), ("HR", "People"), ("Finance", "Money")],
        "dept string, label string",
    )
    out = _run(spark, {"p": people, "d": depts}, [
        {"type": "join", "config": {
            "right_source": "d", "on": ["dept"], "how": "left", "broadcast": True}}
    ], primary="p")
    assert out.filter("id = 5").collect()[0].label == "Money"
    with pytest.raises(KeyError):
        _run(spark, {"p": people}, [
            {"type": "join", "config": {"right_source": "ghost"}}
        ])


def test_pivot_step(spark, people):
    out = _run(spark, {"p": people}, [
        {"type": "pivot", "config": {
            "index": "dept", "columns": "age", "values": "salary",
            "aggfunc": "count", "pivot_values": [28, 30, 39, 45, 51]}}
    ])
    assert set(out.columns) == {"dept", "28", "30", "39", "45", "51"}


def test_typeconversion_step_aliases(spark, people):
    out = _run(spark, {"p": people}, [
        {"type": "typeconversion", "config": {
            "conversions": {"age": "float64", "id": "str", "salary": "int64"}}}
    ])
    types = dict(out.dtypes)
    assert types["age"] == "double" and types["id"] == "string"
    assert types["salary"] == "bigint"


def test_union_step_and_unknown_step(spark, people):
    a = people.filter("dept = 'IT'").select("id", "dept")
    b = people.filter("dept = 'HR'").select("id", "dept")
    out = _run(spark, {"a": a, "b": b}, [
        {"type": "union", "config": {"with": ["b"]}}
    ], primary="a")
    assert out.count() == 4
    with pytest.raises(NotImplementedError):
        _run(spark, {"p": people}, [{"type": "teleport"}])


def test_customudf_gated_by_default(spark, people):
    with pytest.raises(PermissionError):
        _run(spark, {"p": people}, [
            {"type": "customudf", "config": {"udf_code": "result = df"}}
        ])


def test_observe_rows_metrics(spark, people):
    engine = TransformEngine(spark, observe_rows=True)
    out = engine.execute_transformations(
        {"p": people},
        {"steps": [{"type": "filter", "config": {"condition": "age > 30"}}]},
    )
    assert out.count() == 3  # terminal action materializes observations
    assert engine.metrics[0].rows_out() == 3


def test_dedup_step_exact_and_near(spark):
    from metadata_etl_framework_spark.operators import TransformEngine

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
            (3, "the quick brown fox jumps over the lazy cat"),   # near dup
            (4, "completely different content lives here now ok"),
        ],
        "doc_id long, text string",
    )
    engine = TransformEngine(spark)
    exact = engine.execute_transformations(
        {"docs": df},
        {"primary_source": "docs",
         "steps": [{"type": "dedup", "config": {"method": "exact"}}]},
    )
    assert {r.doc_id for r in exact.collect()} == {1, 3, 4}

    near = engine.execute_transformations(
        {"docs": df},
        {"primary_source": "docs",
         "steps": [{"type": "dedup",
                    "config": {"method": "near", "threshold": 0.5,
                               "num_hashes": 32, "num_bands": 8}}]},
    )
    # 1,2,3 collapse to canonical doc 1; 4 untouched
    assert {r.doc_id for r in near.collect()} == {1, 4}

    import pytest as _pt
    with _pt.raises(ValueError):
        engine.execute_transformations(
            {"docs": df},
            {"primary_source": "docs",
             "steps": [{"type": "dedup", "config": {"method": "bogus"}}]},
        )


def test_quality_filter_step(spark):
    from metadata_etl_framework_spark.operators import TransformEngine

    prose = " ".join(
        ["the cat sat on the mat and it is a fine day for all of us"] * 20
    )
    df = spark.createDataFrame(
        [(1, prose), (2, "{}[]()!!;;::##"), (3, None)],
        "doc_id long, text string",
    )
    engine = TransformEngine(spark)
    out = engine.execute_transformations(
        {"docs": df},
        {"primary_source": "docs",
         "steps": [{"type": "quality_filter",
                    "config": {"min_score": 0.5, "keep_score": True}}]},
    )
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].quality_score >= 0.5 and "text" in out.columns


def test_sample_and_split_steps(spark):
    from metadata_etl_framework_spark.operators import TransformEngine

    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i % 5 + 1)) for i in range(200)],
        "doc_id long, text string, w double",
    )
    engine = TransformEngine(spark)
    frac = engine.execute_transformations(
        {"docs": df},
        {"primary_source": "docs",
         "steps": [{"type": "sample",
                    "config": {"mode": "fraction", "fraction": 0.3,
                               "salt": "s1"}}]},
    )
    n = frac.count()
    assert 30 <= n <= 90  # ~60 expected, md5-uniform
    # reproducible
    again = engine.execute_transformations(
        {"docs": df},
        {"primary_source": "docs",
         "steps": [{"type": "sample",
                    "config": {"mode": "fraction", "fraction": 0.3,
                               "salt": "s1"}}]},
    )
    assert {r.doc_id for r in frac.collect()} == {r.doc_id for r in again.collect()}

    wk = engine.execute_transformations(
        {"docs": df},
        {"primary_source": "docs",
         "steps": [{"type": "sample",
                    "config": {"mode": "weighted_k", "k": 20,
                               "weight_column": "w"}}]},
    )
    assert wk.count() == 20 and "priority" not in wk.columns

    clusters = spark.createDataFrame(
        [(i, 0) for i in range(50)], "node long, cluster_id long"
    )
    split = engine.execute_transformations(
        {"docs": df, "clusters": clusters},
        {"primary_source": "docs",
         "steps": [{"type": "split",
                    "config": {"fractions": {"train": 0.8, "val": 0.1,
                                             "test": 0.1},
                               "clusters_source": "clusters"}}]},
    )
    by_doc = {r.doc_id: r.split for r in split.collect()}
    assert len({by_doc[i] for i in range(50)}) == 1  # cluster stays together
    assert set(by_doc.values()) <= {"train", "val", "test"}


def test_filter_funnel_step_apply_and_stats(spark, people):
    steps_apply = [{
        "type": "filter_funnel",
        "config": {"stages": [
            {"name": "adults", "condition": "age >= 30"},
            {"name": "well_paid", "condition": "salary > 60000"},
        ]},
    }]
    out = _run(spark, {"people": people}, steps_apply, primary="people")
    assert sorted(r.id for r in out.collect()) == [2, 4, 5]

    steps_stats = [{
        "type": "filter_funnel",
        "config": {"mode": "stats", "stages": [
            {"name": "adults", "condition": "age >= 30"},
            {"name": "well_paid", "condition": "salary > 60000"},
        ]},
    }]
    stats = {r.stage_name: r for r in
             _run(spark, {"people": people}, steps_stats, primary="people").collect()}
    assert (stats["adults"].entering, stats["adults"].surviving) == (5, 4)
    assert (stats["well_paid"].entering, stats["well_paid"].surviving) == (4, 3)

    with pytest.raises(ValueError, match="stages"):
        _run(spark, {"people": people},
             [{"type": "filter_funnel", "config": {}}], primary="people")


def test_drift_step_against_reference_source(spark, people):
    current = people.withColumn("salary", F.col("salary") * 2)
    steps = [{
        "type": "drift",
        "config": {
            "reference": "people",
            "numeric_columns": ["salary"],
            "categorical_columns": ["dept"],
        },
    }]
    rows = {(r.column, r.metric): r.value for r in _run(
        spark, {"people": people, "current": current}, steps, primary="current"
    ).collect()}
    assert rows[("salary", "ks")] > 0.5   # doubled salaries shift the CDF
    assert rows[("dept", "chi2")] == 0.0  # categorical unchanged
    assert ("salary", "psi") in rows

    with pytest.raises(ValueError, match="reference"):
        _run(spark, {"people": people},
             [{"type": "drift", "config": {"numeric_columns": ["salary"]}}],
             primary="people")


def test_score_eval_step_suite_and_thresholds(spark):
    scored = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.4, 0),
         (0.3, 0), (0.2, 0), (0.1, 0)],
        "s double, y int",
    )
    cfg = {"score_column": "s", "label_column": "y"}
    tall = {r.metric: r.value for r in _run(
        spark, {"d": scored},
        [{"type": "score_eval", "config": dict(cfg, metrics=["auc", "ece"])}],
    ).collect()}
    # hand AUC: positives {.9,.8,.6} vs negatives {.7,.4,.3,.2,.1};
    # pairs won = 14 of 15 -> 0.933333
    assert tall["auc"] == pytest.approx(14 / 15, abs=1e-6)
    assert tall["n_pos"] == 3.0 and tall["n_neg"] == 5.0
    assert "ece" in tall and "pr_auc" not in tall

    sweep = {r.threshold: r for r in _run(
        spark, {"d": scored},
        [{"type": "score_eval", "config": dict(cfg, mode="thresholds")}],
    ).collect()}
    r6 = sweep[0.6]  # predict >= 0.6: pp=4, tp=3, fp=1, fn=0, tn=4
    assert (r6.n_pred_pos, r6.tp, r6.fp, r6.fn, r6.tn) == (4, 3, 1, 0, 4)
    assert r6.precision == 0.75 and r6.recall == 1.0
    assert r6.f1 == pytest.approx(2 * 0.75 / 1.75, abs=1e-6)
    assert r6.accuracy == 0.875

    with pytest.raises(ValueError, match="score_column"):
        _run(spark, {"d": scored},
             [{"type": "score_eval", "config": {"label_column": "y"}}])
    with pytest.raises(ValueError, match="unknown score_eval"):
        _run(spark, {"d": scored},
             [{"type": "score_eval",
               "config": dict(cfg, metrics=["auc", "nope"])}])


def test_score_eval_step_new_modes(spark):
    """Round-10: multiclass / regression modes of the score_eval step,
    plus the unknown-mode guard."""
    cls = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
         ("c", "c")],
        "label string, pred string",
    )
    per_class = {r["class"]: r for r in _run(
        spark, {"d": cls},
        [{"type": "score_eval",
          "config": {"mode": "multiclass", "label_column": "label",
                     "prediction_column": "pred"}}],
    ).collect()}
    assert per_class["a"].support == 3 and per_class["a"].tp == 2
    assert per_class["a"].precision == round(2 / 3, 6)
    assert per_class["c"].f1 == 1.0

    summary = _run(
        spark, {"d": cls},
        [{"type": "score_eval",
          "config": {"mode": "multiclass_summary", "label_column": "label",
                     "prediction_column": "pred"}}],
    ).collect()[0]
    assert summary.n == 6 and summary.n_classes == 3
    assert summary.accuracy == round(4 / 6, 6)

    reg = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.0), (3.0, 2.5)], "yhat double, y double"
    )
    row = _run(
        spark, {"d": reg},
        [{"type": "score_eval",
          "config": {"mode": "regression", "score_column": "yhat",
                     "label_column": "y"}}],
    ).collect()[0]
    assert row.n == 3 and row.mae == round(1.0 / 3, 6)

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown score_eval mode"):
        _run(spark, {"d": reg},
             [{"type": "score_eval",
               "config": {"mode": "bogus", "score_column": "yhat",
                          "label_column": "y"}}])


def test_score_eval_step_generation_modes(spark):
    """Round-10 second sweep: bleu / rouge modes of score_eval — the
    generation-eval entry points of the declarative vocabulary."""
    pairs = spark.createDataFrame(
        [(1, "a b c d e", "a b c d e"), (2, "x y", "x z")],
        "pid long, cand string, ref string",
    )
    cfg = {"id_column": "pid", "candidate_column": "cand",
           "reference_column": "ref"}
    bleu = _run(spark, {"d": pairs},
                [{"type": "score_eval",
                  "config": dict(cfg, mode="bleu")}]).collect()[0]
    assert bleu["n_pairs"] == 2 and 0 < bleu["bleu"] < 1

    per = _run(spark, {"d": pairs},
               [{"type": "score_eval",
                 "config": dict(cfg, mode="rouge", n=1,
                                summary=False)}]).collect()
    by = {r["pid"]: r for r in per}
    assert by[1]["f1"] == 1.0 and by[2]["recall"] == 0.5

    summ = _run(spark, {"d": pairs},
                [{"type": "score_eval",
                  "config": dict(cfg, mode="rouge", n=1)}]).collect()[0]
    assert summ["n_pairs"] == 2

    ch = _run(spark, {"d": pairs},
              [{"type": "score_eval",
                "config": dict(cfg, mode="chrf")}]).collect()[0]
    assert ch["n_pairs"] == 2 and 0 < ch["chrf"] < 1

    with pytest.raises(ValueError, match="generation modes"):
        _run(spark, {"d": pairs},
             [{"type": "score_eval", "config": {"mode": "bleu"}}])


def test_feature_encode_step_modes(spark):
    """feature_encode: target_oof appends the encoding, woe_table and
    hash return their tables; bad configs raise."""
    df = spark.createDataFrame(
        [(i, "c%d" % (i % 3), i % 2) for i in range(60)],
        "id long, cat string, y int",
    )
    enc = _run(spark, {"d": df},
               [{"type": "feature_encode",
                 "config": {"cat_column": "cat", "target_column": "y",
                            "id_column": "id", "n_folds": 3,
                            "output_column": "enc"}}])
    assert "enc" in enc.columns and enc.where("enc IS NULL").count() == 0

    woe = _run(spark, {"d": df},
               [{"type": "feature_encode",
                 "config": {"mode": "woe_table", "cat_column": "cat",
                            "label_column": "y"}}]).collect()
    assert {r["cat"] for r in woe} == {"c0", "c1", "c2"}

    h = _run(spark, {"d": df},
             [{"type": "feature_encode",
               "config": {"mode": "hash", "id_column": "id",
                          "categorical_columns": ["cat"],
                          "n_buckets": 16}}])
    assert h.count() == 60  # one categorical triple per row

    with pytest.raises(ValueError, match="target_oof needs"):
        _run(spark, {"d": df},
             [{"type": "feature_encode", "config": {"cat_column": "cat"}}])
    with pytest.raises(ValueError, match="unknown feature_encode"):
        _run(spark, {"d": df},
             [{"type": "feature_encode", "config": {"mode": "nope"}}])


def test_aggregate_step_rollup_and_cube_modes(spark):
    """Round-10: rollup/cube aggregate modes — subtotal levels with the
    grouping_id bitmask; bad mode raises; cube adds the cross-level."""
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)],
        "g1 string, g2 string, v int",
    )
    cfg = {"mode": "rollup", "group_by": ["g1", "g2"],
           "aggregations": {"v": ["sum", "count"]}}
    rows = _run(spark, {"d": df},
                [{"type": "aggregate", "config": cfg}]).collect()
    by = {(r["g1"], r["g2"], r["grouping_id"]): r for r in rows}
    assert by[("a", "x", 0)]["v_sum"] == 1
    assert by[("a", None, 1)]["v_sum"] == 3     # subtotal over g2
    assert by[(None, None, 3)]["v_sum"] == 6    # grand total
    assert len(rows) == 3 + 2 + 1

    cube = _run(spark, {"d": df},
                [{"type": "aggregate",
                  "config": dict(cfg, mode="cube")}]).collect()
    cb = {(r["g1"], r["g2"], r["grouping_id"]): r for r in cube}
    assert cb[(None, "x", 2)]["v_sum"] == 4     # cube-only level
    with pytest.raises(ValueError, match="unknown aggregate mode"):
        _run(spark, {"d": df},
             [{"type": "aggregate", "config": dict(cfg, mode="nope")}])


def test_drift_step_embedding_mode(spark):
    """Round-10: the drift step's embedding arm — identical snapshots
    give centroid cosine 1 / PSI 0, tagged with the embedding column
    name; composes with the scalar suite in one tall frame."""
    rows = [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    out = _run(
        spark, {"cur": emb, "base": emb},
        [{"type": "drift",
          "config": {"reference": "base", "embedding_column": "e"}}],
        primary="cur",
    ).collect()
    got = {(r["column"], r["metric"]): r["value"] for r in out}
    assert got[("e", "centroid_cosine")] == 1.0
    assert got[("e", "psi_cos_to_centroid")] == 0.0

    both = _run(
        spark, {"cur": emb.withColumn("x", F.col("vec_id") * 1.0),
                "base": emb.withColumn("x", F.col("vec_id") * 1.0)},
        [{"type": "drift",
          "config": {"reference": "base", "numeric_columns": ["x"],
                     "embedding_column": "e"}}],
        primary="cur",
    )
    cols = {r["column"] for r in both.collect()}
    assert {"x", "e"} <= cols

    with pytest.raises(ValueError, match="numeric_columns"):
        _run(spark, {"cur": emb, "base": emb},
             [{"type": "drift", "config": {"reference": "base"}}],
             primary="cur")


def test_score_eval_step_qini_mode(spark):
    """Round-10: qini mode — per-bucket table and 1-row summary."""
    rows = [(i, (i * 37 % 100) / 100.0, i % 2,
             int((i % 2 == 1 and (i * 37 % 100) >= 50) or i % 10 == 0))
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, s double, t int, y int")
    cfg = {"mode": "qini", "score_column": "s", "treatment_column": "t",
           "outcome_column": "y", "id_column": "id", "n_buckets": 5}
    tab = _run(spark, {"d": df},
               [{"type": "score_eval", "config": cfg}]).collect()
    assert len(tab) == 5 and tab[0]["qini"] is not None
    summ = _run(spark, {"d": df},
                [{"type": "score_eval",
                  "config": dict(cfg, summary=True)}]).collect()[0]
    assert summ["qini_coefficient"] > 0
    with pytest.raises(ValueError, match="qini mode"):
        _run(spark, {"d": df},
             [{"type": "score_eval",
               "config": {"mode": "qini", "score_column": "s"}}])


def test_experiment_eval_step_modes(spark):
    rows = []
    for i in range(40):
        g = "A" if i % 2 == 0 else "B"
        conv = (i % 4 == 0) if g == "A" else (i % 8 == 0)
        rows.append((i, g, bool(conv), float(i % 7), float(i % 5)))
    df = spark.createDataFrame(
        rows, "u long, g string, c boolean, y double, x double"
    )
    base = {"variant_column": "g", "unit_column": "u"}

    r = _run(spark, {"d": df}, [{
        "type": "experiment_eval",
        "config": dict(base, converted_column="c"),
    }]).collect()[0]
    assert r["variant_a"] == "A" and r["n_a"] == 20

    r = _run(spark, {"d": df}, [{
        "type": "experiment_eval",
        "config": dict(base, mode="cuped", metric_column="y",
                       covariate_column="x"),
    }]).collect()[0]
    assert "adj_diff" in r.asDict() and r["n_a"] == 20

    r = _run(spark, {"d": df}, [{
        "type": "experiment_eval",
        "config": dict(base, mode="power", converted_column="c"),
    }]).collect()[0]
    assert 0.0 <= r["power"] <= 1.0

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown experiment_eval mode"):
        _run(spark, {"d": df}, [{
            "type": "experiment_eval", "config": dict(base, mode="nope"),
        }])
    with _pt.raises(ValueError, match="converted_column"):
        _run(spark, {"d": df}, [{
            "type": "experiment_eval", "config": base,
        }])


def test_experiment_eval_step_logrank(spark):
    import datetime as dt

    base_ts = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        g = "A" if i % 2 == 0 else "B"
        days = 3 if g == "A" else 25
        rows.append((i, g, base_ts))
        rows.append((i, g, base_ts + dt.timedelta(days=days)))
    df = spark.createDataFrame(rows, "u long, g string, ts timestamp")
    r = _run(spark, {"d": df}, [{
        "type": "experiment_eval",
        "config": {"mode": "logrank", "variant_column": "g",
                   "unit_column": "u", "ts_column": "ts",
                   "horizon_days": 7},
    }]).collect()[0]
    assert r["events_a"] == 15 and r["events_b"] == 0
    assert r["significant_95"]


def test_privacy_audit_step_modes(spark):
    df = spark.createDataFrame(
        [("z1", "a", 1.0)] * 5 + [("z2", "b", 2.0)],
        "zip string, seg string, bal double",
    )
    qi = {"qi_columns": ["zip", "seg"]}

    summary = _run(spark, {"d": df}, [{
        "type": "privacy_audit", "config": dict(qi, k=3),
    }]).collect()[0]
    assert summary["n_classes"] == 2 and summary["n_violating_classes"] == 1

    classes = _run(spark, {"d": df}, [{
        "type": "privacy_audit", "config": dict(qi, mode="k_classes", k=3),
    }]).collect()
    assert len(classes) == 2

    ld = _run(spark, {"d": df}, [{
        "type": "privacy_audit",
        "config": dict(qi, mode="l_diversity", sensitive_column="bal"),
    }]).collect()
    assert all(r["n_sensitive"] == 1 and r["below_l"] for r in ld)

    dp = _run(spark, {"d": df}, [{
        "type": "privacy_audit",
        "config": {"mode": "dp_counts", "group_columns": ["zip"],
                   "epsilon": 2.0, "seed": 1},
    }]).collect()
    assert {r["zip"] for r in dp} == {"z1", "z2"}
    assert all(r["noisy_count"] == round(r["exact_count"] + r["noise"], 6)
               for r in dp)

    import pytest as _pt
    with _pt.raises(ValueError, match="qi_columns"):
        _run(spark, {"d": df}, [{
            "type": "privacy_audit", "config": {"k": 3},
        }])


def test_score_eval_step_conformal(spark):
    import pytest as _pt

    df = spark.range(1, 801).selectExpr(
        "id AS k", "CAST(id % 50 AS DOUBLE) AS y",
        "CAST(id % 50 AS DOUBLE) + CAST(id % 9 AS DOUBLE) - 4.0 AS pred",
    )
    r = _run(spark, {"d": df}, [{
        "type": "score_eval",
        "config": {"mode": "conformal", "score_column": "pred",
                   "label_column": "y", "id_column": "k",
                   "alpha": 0.2},
    }]).collect()[0]
    assert r["alpha"] == 0.2
    assert r["coverage"] >= 0.75
    with _pt.raises(ValueError, match="conformal mode needs"):
        _run(spark, {"d": df}, [{
            "type": "score_eval",
            "config": {"mode": "conformal", "score_column": "pred",
                       "label_column": "y"},
        }])


def test_model_train_step_modes(spark):
    import pytest as _pt

    docs = spark.createDataFrame(
        [(1, "apple banana", "fruit"), (2, "carrot onion", "veg"),
         (3, "apple apple", "fruit"), (4, "onion potato", "veg")],
        "doc_id long, text string, lab string",
    )
    nb = _run(spark, {"d": docs}, [{
        "type": "model_train",
        "config": {"mode": "naive_bayes", "text_column": "text",
                   "label_column": "lab"},
    }]).collect()
    assert {r["kind"] for r in nb} == {"prior", "token", "default"}

    num = spark.range(200).selectExpr(
        "CAST(id % 20 AS DOUBLE) / 5.0 AS x",
        "CAST(id % 20 >= 10 AS BOOLEAN) AS y",
    )
    logit = {r["term"]: r for r in _run(spark, {"d": num}, [{
        "type": "model_train",
        "config": {"mode": "logistic", "feature_columns": ["x"],
                   "label_column": "y", "iterations": 4},
    }]).collect()}
    assert logit["x"]["beta"] > 0 and logit["x"]["iterations"] == 4

    lin = {r["term"]: r for r in _run(spark, {"d": num}, [{
        "type": "model_train",
        "config": {"mode": "linear", "feature_columns": ["x"],
                   "label_column": "y"},
    }]).collect()}
    assert 0.0 < lin["x"]["beta"] < 1.0  # slope of the step function

    with _pt.raises(ValueError, match="label_column"):
        _run(spark, {"d": num}, [{
            "type": "model_train", "config": {"mode": "linear"},
        }])
    with _pt.raises(ValueError, match="feature_columns"):
        _run(spark, {"d": num}, [{
            "type": "model_train",
            "config": {"mode": "logistic", "label_column": "y"},
        }])
    with _pt.raises(ValueError, match="unknown model_train mode"):
        _run(spark, {"d": num}, [{
            "type": "model_train",
            "config": {"mode": "forest", "label_column": "y"},
        }])


def test_model_score_step_modes(spark):
    import pytest as _pt

    from metadata_etl_framework_spark.ops.classify import nb_train
    from metadata_etl_framework_spark.ops.glm import logistic_train

    docs = spark.createDataFrame(
        [(1, "apple banana", "fruit"), (2, "carrot onion", "veg"),
         (3, "apple apple", "fruit"), (4, "onion potato", "veg")],
        "doc_id long, text string, lab string",
    )
    model = nb_train(docs, "text", "lab")
    test = spark.createDataFrame(
        [(10, "banana apple"), (11, "potato carrot")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["predicted_label"] for r in _run(
        spark, {"d": test, "m": model}, [{
            "type": "model_score",
            "config": {"mode": "naive_bayes", "model_source": "m",
                       "text_column": "text", "id_column": "doc_id"},
        }], primary="d").collect()}
    assert out == {10: "fruit", 11: "veg"}

    num = spark.range(200).selectExpr(
        "CAST(id % 20 AS DOUBLE) / 5.0 AS x",
        "CAST(id % 20 >= 10 AS BOOLEAN) AS y",
    )
    glm = logistic_train(num, ["x"], "y", iterations=4)
    scored = _run(spark, {"d": num, "m": glm}, [{
        "type": "model_score",
        "config": {"mode": "logistic", "model_source": "m",
                   "output_column": "p_hat"},
    }], primary="d")
    rows = scored.collect()
    assert all(0.0 <= r["p_hat"] <= 1.0 for r in rows)
    hi = [r for r in rows if r["x"] > 3.0]
    lo = [r for r in rows if r["x"] < 1.0]
    assert min(r["p_hat"] for r in hi) > max(r["p_hat"] for r in lo)

    with _pt.raises(ValueError, match="model_source"):
        _run(spark, {"d": num}, [{
            "type": "model_score", "config": {"mode": "logistic"},
        }])
    with _pt.raises(ValueError, match="_intercept"):
        _run(spark, {"d": num, "m": num.selectExpr(
            "'x' AS term", "1.0 AS beta")}, [{
            "type": "model_score",
            "config": {"mode": "linear", "model_source": "m"},
        }])
