"""Unit tests for ops/classify.py — in-engine multinomial Naive Bayes."""

from __future__ import annotations

import math

import pytest

from metadata_etl_framework_spark.ops.classify import nb_score, nb_train


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lab string")


def test_nb_recovers_separable_classes(spark):
    rows = []
    did = 0
    for _ in range(10):
        rows.append((did, "apple banana apple fruit", "fruit")); did += 1
        rows.append((did, "carrot potato onion veg", "veg")); did += 1
    train = _docs(spark, rows)
    model = nb_train(train, "text", "lab")
    test = _docs(spark, [
        (100, "apple apple banana", None),
        (101, "potato onion", None),
    ])
    out = {r.doc_id: r for r in
           nb_score(test, model, "text", "doc_id").collect()}
    assert out[100].predicted_label == "fruit"
    assert out[101].predicted_label == "veg"
    assert out[100].n_tokens == 3 and out[101].n_tokens == 2


def test_nb_model_weights_exact(spark):
    # 2 docs: c1 = "a a b", c2 = "b"; vocab {a, b}, alpha = 1
    train = _docs(spark, [(1, "a a b", "c1"), (2, "b", "c2")])
    model = {(r.kind, r.label, r.token): r.weight
             for r in nb_train(train, "text", "lab").collect()}
    # priors: ln(1/2) each
    assert model[("prior", "c1", None)] == round(math.log(0.5), 12)
    # c1: T=3, V=2 -> P(a|c1) = (2+1)/(3+2) = 0.6
    assert model[("token", "c1", "a")] == round(math.log(3 / 5), 12)
    assert model[("token", "c1", "b")] == round(math.log(2 / 5), 12)
    # c2: T=1 -> P(b|c2) = (1+1)/(1+2); default = 1/(1+2)
    assert model[("token", "c2", "b")] == round(math.log(2 / 3), 12)
    assert model[("default", "c2", None)] == round(math.log(1 / 3), 12)
    assert model[("default", "c1", None)] == round(math.log(1 / 5), 12)


def test_nb_unseen_and_empty_text(spark):
    train = _docs(spark, [
        (1, "x x x", "a"), (2, "x x x", "a"), (3, "y", "b"),
    ])
    model = nb_train(train, "text", "lab")
    test = _docs(spark, [
        (10, "zzz qqq", None),   # all tokens outside vocab -> dropped
        (11, "", None),          # empty text
        (12, None, None),        # null text
    ])
    out = {r.doc_id: r for r in
           nb_score(test, model, "text", "doc_id").collect()}
    # every doc scores on the prior alone -> majority class 'a'
    for did in (10, 11, 12):
        assert out[did].predicted_label == "a"
        assert out[did].n_tokens == 0
        assert out[did].score == round(math.log(2 / 3), 12)


def test_nb_min_count_prunes_vocab(spark):
    train = _docs(spark, [
        (1, "common common rare", "a"), (2, "common", "b"),
    ])
    model = nb_train(train, "text", "lab", min_count=2)
    toks = {r.token for r in model.collect() if r.kind == "token"}
    assert toks == {"common"}


def test_nb_gates(spark):
    train = _docs(spark, [(1, "a", "x")])
    with pytest.raises(ValueError, match="smoothing"):
        nb_train(train, "text", "lab", smoothing=0.0)
    with pytest.raises(ValueError, match="min_count"):
        nb_train(train, "text", "lab", min_count=0)


def test_nb_top_terms_margins(spark):
    # 'apple' appears only in fruit docs -> top fruit discriminator;
    # 'onion' only in veg; the shared token 'food' has ~zero margin
    train = _docs(spark, [
        (1, "apple food", "fruit"), (2, "apple food", "fruit"),
        (3, "onion food", "veg"), (4, "onion food", "veg"),
    ])
    model = nb_train(train, "text", "lab")
    from metadata_etl_framework_spark.ops.classify import nb_top_terms

    out = {(r.label, r.rank): r for r in
           nb_top_terms(model, k=3).collect()}
    assert out[("fruit", 1)].token == "apple"
    assert out[("veg", 1)].token == "onion"
    assert out[("fruit", 1)].margin > 0
    # shared token: identical weight both classes -> margin 0
    food = [r for r in out.values() if r.token == "food"]
    assert food and all(r.margin == 0.0 for r in food)


def test_nb_top_terms_k_gate(spark):
    import pytest as _pt

    from metadata_etl_framework_spark.ops.classify import nb_top_terms

    train = _docs(spark, [(1, "a", "x"), (2, "b", "y")])
    with _pt.raises(ValueError, match="k must"):
        nb_top_terms(nb_train(train, "text", "lab"), k=0)
