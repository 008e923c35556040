"""PaddedGraph container tests."""
import numpy as np
import pytest

from pmgt_tpu.graph.container import (
    NUM_SPECIAL_NODES,
    PaddedGraph,
    from_edges,
    from_networkx,
)


def test_from_edges_basic():
    g = from_edges(4, [(0, 1, 2.0), (1, 2, 3.0), (0, 3, 1.0)])
    assert g.num_nodes == 4
    assert g.num_total == 6
    # node 0 (row 2): neighbors 1, 3 (shifted by 2 → rows 3, 5)
    assert g.degrees[2] == 2
    assert set(g.nbr_ids[2, :2].tolist()) == {3, 5}
    # weight ordering matches neighbor ordering
    w = dict(zip(g.nbr_ids[2, :2].tolist(), g.nbr_logits[2, :2].tolist()))
    assert w[3] == pytest.approx(2.0)
    assert w[5] == pytest.approx(1.0)
    # padding is -inf
    assert np.isneginf(g.nbr_logits[2, 2:]).all()


def test_special_rows_well_defined():
    g = from_edges(3, [(0, 1, 1.0)])
    for row in (0, 1):
        assert g.degrees[row] == 0
        assert g.nbr_logits[row, 0] == 0.0
        assert g.nbr_ids[row, 0] == 0


def test_isolated_node_sentinel():
    g = from_edges(3, [(0, 1, 1.0)])  # node 2 isolated
    row = 2 + NUM_SPECIAL_NODES
    assert g.degrees[row] == 0
    assert g.nbr_logits[row, 0] == 0.0


def test_degree_cap_keeps_highest_weight():
    edges = [(0, i, float(i)) for i in range(1, 6)]
    g = from_edges(6, edges, max_degree=2)
    assert g.degrees[2] == 2
    kept = set(g.nbr_ids[2, :2].tolist())
    # highest-weight neighbors are 4 and 5 (rows 6, 7)
    assert kept == {6, 7}


def test_save_load_roundtrip(tmp_path):
    g = from_edges(5, [(0, 1, 1.0), (2, 3, 2.0), (3, 4, 0.5)])
    path = str(tmp_path / "g.npz")
    g.save(path)
    g2 = PaddedGraph.load(path)
    np.testing.assert_array_equal(g.nbr_ids, g2.nbr_ids)
    np.testing.assert_array_equal(g.degrees, g2.degrees)
    np.testing.assert_allclose(g.nbr_logits, g2.nbr_logits)


def test_from_networkx_matches_from_edges():
    import networkx as nx

    nxg = nx.Graph()
    nxg.add_weighted_edges_from([(0, 1, 1.5), (1, 2, 2.5), (2, 3, 0.5)])
    a = from_networkx(nxg)
    b = from_edges(4, [(0, 1, 1.5), (1, 2, 2.5), (2, 3, 0.5)])
    np.testing.assert_array_equal(a.degrees, b.degrees)


def test_from_networkx_offset_nodes():
    import networkx as nx

    nxg = nx.Graph()
    # reference-style relabeled space starting at 2
    nxg.add_weighted_edges_from([(2, 3, 1.0), (3, 4, 2.0)])
    g = from_networkx(nxg)
    assert g.num_nodes == 3
    assert g.degrees[3] == 2  # middle node


def test_from_edges_dedupes_and_drops_self_loops():
    """networkx.Graph semantics: duplicate (u,v) listings overwrite (last
    weight wins), self-loops are dropped — also a hard requirement of the
    complement rank-select negative sampler (distinct sorted rows)."""
    from pmgt_tpu.graph.container import NUM_SPECIAL_NODES, from_edges

    g = from_edges(
        4,
        [
            (0, 1, 1.0),
            (1, 0, 3.0),  # duplicate in the other orientation
            (0, 1, 2.0),  # duplicate again: last weight wins
            (2, 2, 9.0),  # self loop: dropped
            (2, 3, 1.5),
        ],
    )
    deg = np.asarray(g.degrees)
    np.testing.assert_array_equal(deg[NUM_SPECIAL_NODES:], [1, 1, 1, 1])
    # node 0's single neighbor is node 1 with the last-written weight
    assert g.nbr_ids[NUM_SPECIAL_NODES, 0] == 1 + NUM_SPECIAL_NODES
    assert g.nbr_logits[NUM_SPECIAL_NODES, 0] == 2.0
    # sorted rows are distinct and padded past the range
    row = np.asarray(g.nbr_sorted)[NUM_SPECIAL_NODES]
    assert row[0] == 1 + NUM_SPECIAL_NODES and (row[1:] >= g.num_total).all()
