"""FastText-style quality classifier: seed training + expression scoring."""

import pyspark.sql.functions as F
import pytest


def _corpora(spark):
    eng = [
        "the quick brown fox jumps over the lazy dog and runs away today",
        "a small red house stands near the quiet river in the morning light",
        "she reads a long book about the history of science and nature",
        "the children play in the garden while their parents cook dinner",
        "he walks to the market every day to buy fresh bread and milk",
        "we watched the sunset over the mountains from the old wooden bridge",
    ]
    junk = [
        "zxq wvv kjh qqpz mnx bbv hjkl zzz xxy qwe rty uio",
        "asdf qwer zxcv tyui ghjk bnm poiuy lkjh mnbv xswz",
        "111 222 333 444 555 666 777 888 999 000 qqq www",
        "xoxo zzzz yyyy wwww vvvv uuuu tttt ssss rrrr qqqq",
        "kl jk hj gh fg df sd as zx xc cv vb bn nm qw we",
        "blorp skree zonk fizz buzz klax vree snib qorp dwee",
    ]
    pos = spark.createDataFrame([(i, t) for i, t in enumerate(eng)], ["doc_id", "text"])
    neg = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(junk)], ["doc_id", "text"]
    )
    return pos, neg


@pytest.mark.slow
def test_classifier_separates_and_scores_in_pure_expressions(spark):
    from venice_spark.quality import score_quality, train_quality_classifier

    pos, neg = _corpora(spark)
    model = train_quality_classifier(pos, neg, dim=128, max_iter=30)
    assert len(model["weights"]) == 128
    s_pos = [r["quality_prob"] for r in score_quality(pos, model).collect()]
    s_neg = [r["quality_prob"] for r in score_quality(neg, model).collect()]
    assert min(s_pos) > max(s_neg)  # training data fully separated
    # unseen English-like text scores above unseen gibberish
    probe = spark.createDataFrame(
        [(1, "the old man walks his dog near the river every morning"),
         (2, "qzx wvv bnp zzk xoxo blorp vree mnx qqq tyui")],
        ["doc_id", "text"],
    )
    sc = {r["doc_id"]: r["quality_prob"] for r in score_quality(probe, model).collect()}
    assert sc[1] > sc[2]
    # the scoring pass is pure expressions: no Python stage in the plan
    plan = score_quality(probe, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_filter_threshold_and_pareto(spark):
    from venice_spark.quality import quality_filter, train_quality_classifier

    pos, neg = _corpora(spark)
    model = train_quality_classifier(pos, neg, dim=128, max_iter=30)
    both = pos.unionByName(neg)
    kept = quality_filter(both, model, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(6))  # exactly the English half
    # pareto mode: deterministic, keeps all high-prob docs at small alpha,
    # and may keep some low-prob ones; re-run is identical
    a = sorted(r["doc_id"] for r in quality_filter(both, model, pareto_alpha=3.0).collect())
    b = sorted(r["doc_id"] for r in quality_filter(both, model, pareto_alpha=3.0).collect())
    assert a == b
    assert set(range(6)) <= set(a)
