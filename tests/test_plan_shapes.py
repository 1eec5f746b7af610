"""Physical-plan regression tests: the optimizations SCALE.md claims must
actually appear in the executed plans — pushdown reaching the scan,
broadcast joins for key lookups, rank-limit pushdown for latest-wins,
column pruning for projections. If a refactor silently de-optimizes a
plan, these fail before any benchmark notices."""

import pyspark.sql.functions as F

from venice_spark.plans.reference_queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_single_get_pushes_filter_to_scan(spark, sf_dir):
    df = QUERIES["r1_single_get"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "c_custkey" in plan.split("PushedFilters")[1][:200], plan


def test_batch_get_is_broadcast_join(spark, sf_dir):
    df = QUERIES["r2_batch_get"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    df = QUERIES["r4_project"](spark, sf_dir)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_name" in read_schema and "p_comment" not in read_schema, read_schema


def test_latest_wins_has_rank_limit_pushdown(spark, sf_dir):
    df = QUERIES["w1_put_latest_wins"](spark, sf_dir)
    plan = _plan(df)
    # WindowGroupLimit computes per-partition top-1 before the shuffle
    assert "WindowGroupLimit" in plan, plan


def test_ann_topk_avoids_global_sort(spark, sf_dir):
    df = QUERIES["x_ann_topk"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_vector_compute_has_no_python_stage(spark, sf_dir):
    for q in ("r5_dot_product", "r6_cosine_similarity", "x_token_count"):
        plan = _plan(QUERIES[q](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (q, plan)


def test_filter_compute_prunes_partitions_of_sorted_store(spark, sf_dir):
    df = QUERIES["r10_filter_compute"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(l_orderkey" in pushed or "l_orderkey" in pushed, pushed


def test_knn_join_lsh_has_no_cartesian_product(spark, sf_dir):
    """The blocked k-NN join must plan hash joins on (table, bucket) and id —
    never a cartesian/nested-loop product (that is exactly what it exists to
    replace)."""
    df = QUERIES["x_knn_join_lsh"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_store_get_prunes_partition_dirs(spark, sf_dir, tmp_path):
    from venice_spark import VeniceSparkEngine

    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("c", key_fields=["c_custkey"], partition_count=8)
    eng.push("c", spark.read.parquet(f"{sf_dir}/customer.parquet"))
    st = eng.store("c")
    out = st.batch_get([1, 2, 3])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # version layout is partitioned by partition_id -> the scan must carry
    # partition filters (directory pruning), not just data filters
    assert "PartitionFilters: [" in plan and "partition_id" in plan.split("PartitionFilters")[1][:200], plan
    assert st.get(1) is not None
    assert st.get(10**9) is None
