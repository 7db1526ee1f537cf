"""Connected-components clustering: closure over transitive chains, multi-
component separation, canonical-min labeling, convergence."""

from pyspark.sql import functions as F

from counsel_data_pipeline_spark.ops.clusters import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def test_chain_closes_into_one_component(spark):
    # A-B, B-C, C-D: one cluster even though A-D never paired directly
    cc = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r.id: r.comp for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    cc = connected_components(_edges(spark, [(1, 2), (10, 11), (11, 12), (20, 21)]))
    got = {r.id: r.comp for r in cc.collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_path_needs_multiple_rounds(spark):
    # path graph 0-1-2-...-9: diameter 9 forces several propagation rounds
    cc = connected_components(_edges(spark, [(i, i + 1) for i in range(9)]))
    comps = {r.comp for r in cc.collect()}
    assert comps == {0}


def test_cluster_sizes_and_canonical_ids(spark):
    out = dedup_clusters(_edges(spark, [(5, 3), (3, 8), (100, 101)]))
    rows = {r.doc_id: (r.cluster_id, r.cluster_size) for r in out.collect()}
    assert rows == {
        3: (3, 3), 5: (3, 3), 8: (3, 3),
        100: (100, 2), 101: (100, 2),
    }


def test_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(2, 1), (3, 2)])).collect()
    b = connected_components(_edges(spark, [(1, 2), (2, 3)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_convergence_on_final_round_is_not_an_error(spark):
    """A path that reaches its fixpoint exactly on round max_rounds used to
    raise (the changed counter counts updates MADE, not REMAINING): the
    post-loop re-check must recognize the labels as final."""
    import pytest

    edges = _edges(spark, [(i, i + 1) for i in range(3)])  # diameter 3
    cc = connected_components(edges, max_rounds=3)
    assert {r.comp for r in cc.collect()} == {0}
    # one round short of the diameter must still raise
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)
