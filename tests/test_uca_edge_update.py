"""Parity of the incremental per-tile edge update
(calc_uca(uca_init=..., edge_init_data=...)) vs the reference."""
import warnings

import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures

oracle = pytest.importorskip("oracle")


def _edge_dicts(shape, left=None):
    n, m = shape
    zeros_d = {k: np.zeros(s, "float64") for k, s in
               [("left", n), ("right", n), ("top", m), ("bottom", m)]}
    done = {k: np.zeros(s, bool) for k, s in
            [("left", n), ("right", n), ("top", m), ("bottom", m)]}
    todo = {k: np.zeros(s, bool) for k, s in
            [("left", n), ("right", n), ("top", m), ("bottom", m)]}
    if left is not None:
        zeros_d["left"] = left
        done["left"][:] = True
    return zeros_d, done, todo


def test_edge_update_parity():
    # Case 31 (noisy cone): float noise avoids exact facet-magnitude ties,
    # whose 1-ulp tie-breaks can legitimately differ between XLA and numpy
    # (both answers are equally-steep facets; see slope_direction.py notes).
    N = 32
    elev, _a, _u = fixtures.get_test_case(31, N)
    half = elev[:, 14:]  # right tile with overlap into the left half

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # interior pass on the tile, both implementations
        ref = oracle.reference_processor(half.copy(), fill_flats=False,
                                         drain_pits_path=False)
        ref.calc_slopes_directions()
        ref_uca0 = ref.calc_uca().copy()
        ref_todo = ref.edge_todo.copy()

        mine = DEMProcessor(elev=half.copy(), fill_flats=False,
                            drain_pits_path=False)
        mine.calc_slopes_directions()
        my_uca0 = mine.calc_uca().copy()

        both_nan = np.isnan(ref_uca0) & np.isnan(my_uca0)
        np.testing.assert_array_almost_equal(
            np.where(both_nan, 0, ref_uca0), np.where(both_nan, 0, my_uca0))

        # full-canvas truth provides the left-edge data
        full = oracle.reference_processor(elev.copy(), fill_flats=False,
                                          drain_pits_path=False)
        full.calc_slopes_directions()
        full_uca = full.calc_uca()
        left_strip = full_uca[:, 14].astype("float64")

        data, done, todo = _edge_dicts(half.shape, left=left_strip)
        todo["left"][:] = ref_todo[:, 0]

        ref2 = oracle.reference_processor(half.copy(), fill_flats=False,
                                          drain_pits_path=False)
        ref2.calc_slopes_directions()
        ref_final = ref2.calc_uca(uca_init=ref_uca0,
                                  edge_init_data=[data, done, todo])

        mine2 = DEMProcessor(elev=half.copy(), fill_flats=False,
                             drain_pits_path=False)
        mine2.calc_slopes_directions()
        my_final = mine2.calc_uca(uca_init=my_uca0,
                                  edge_init_data=[data, done, todo])

    both_nan = np.isnan(ref_final) & np.isnan(my_final)
    np.testing.assert_array_almost_equal(
        np.where(both_nan, 0, np.asarray(ref_final, "float64")),
        np.where(both_nan, 0, my_final), decimal=8)
    np.testing.assert_array_equal(ref2.edge_done, mine2.edge_done)


def _fresh(elev, impl):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        if impl == "ref":
            dp = oracle.reference_processor(elev.copy(), fill_flats=False,
                                            drain_pits_path=False)
        else:
            dp = DEMProcessor(elev=elev.copy(), fill_flats=False,
                              drain_pits_path=False)
        dp.calc_slopes_directions()
        dp.calc_uca()
    return dp


def _update(elev, uca0, edge_init, impl):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        if impl == "ref":
            dp = oracle.reference_processor(elev.copy(), fill_flats=False,
                                            drain_pits_path=False)
        else:
            dp = DEMProcessor(elev=elev.copy(), fill_flats=False,
                              drain_pits_path=False)
        dp.calc_slopes_directions()
        out = dp.calc_uca(uca_init=uca0.copy(), edge_init_data=edge_init)
    return np.asarray(out, "float64"), dp


def _cmp_nan(a, b, decimal=8, msg=""):
    a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN pattern: " + msg
    np.testing.assert_array_almost_equal(
        np.nan_to_num(a), np.nan_to_num(b), decimal=decimal, err_msg=msg)


@pytest.mark.parametrize("side", ["left", "right", "top", "bottom"])
def test_edge_update_parity_all_orientations(side):
    """Every edge orientation of the incremental update matches the
    reference (dem_processing.py:682-771 setup, :778-862 propagation)."""
    N = 32
    cut = 14
    elev, _a, _u = fixtures.get_test_case(31, N)
    tiles = {
        "left": elev[:, cut:],        # receives across its left edge
        "right": elev[:, : cut + 1],  # ... right edge
        "top": elev[cut:, :],
        "bottom": elev[: cut + 1, :],
    }
    tile = tiles[side]

    full = _fresh(elev, "ref")
    full_uca = np.asarray(full.uca, "float64")
    strips = {
        "left": full_uca[:, cut], "right": full_uca[:, cut],
        "top": full_uca[cut, :], "bottom": full_uca[cut, :],
    }
    strip = np.nan_to_num(strips[side])

    ref = _fresh(tile, "ref")
    mine = _fresh(tile, "mine")
    _cmp_nan(ref.uca, mine.uca, msg="fresh uca (%s)" % side)

    data, done, todo = _edge_dicts(tile.shape)
    data[side] = strip
    done[side][:] = True
    todo[side][:] = np.asarray(ref.edge_todo)[{
        "left": (slice(None), 0), "right": (slice(None), -1),
        "top": (0, slice(None)), "bottom": (-1, slice(None))}[side]]

    ref_final, ref2 = _update(tile, np.asarray(ref.uca, "float64"),
                              [data, done, todo], "ref")
    my_final, mine2 = _update(tile, np.asarray(mine.uca, "float64"),
                              [data, done, todo], "mine")
    _cmp_nan(ref_final, my_final, msg="updated uca (%s)" % side)
    np.testing.assert_array_equal(np.asarray(ref2.edge_done),
                                  np.asarray(mine2.edge_done),
                                  err_msg="edge_done (%s)" % side)
    np.testing.assert_array_equal(np.asarray(ref2.edge_todo, bool),
                                  np.asarray(mine2.edge_todo, bool),
                                  err_msg="edge_todo (%s)" % side)


def test_edge_update_two_round_chained():
    """Two chained update rounds (partial edge data first, the rest later)
    reproduce the reference's done∧todo bookkeeping round over round —
    the multi-round tile scheduling of process_manager.py:1221-1244."""
    N = 32
    cut = 14
    elev, _a, _u = fixtures.get_test_case(31, N)
    tile = elev[:, cut:]

    full = _fresh(elev, "ref")
    strip = np.nan_to_num(np.asarray(full.uca, "float64")[:, cut])

    ref = _fresh(tile, "ref")
    mine = _fresh(tile, "mine")
    n = tile.shape[0]
    half1 = np.zeros(n, bool)
    half1[: n // 2] = True
    todo0 = np.asarray(ref.edge_todo)[:, 0]

    # round 1: only the upper half of the left edge is ready
    data, done, todo = _edge_dicts(tile.shape)
    data["left"] = strip * half1
    done["left"] = half1.copy()
    todo["left"] = todo0.copy()
    ref1, refp1 = _update(tile, np.asarray(ref.uca, "float64"),
                          [data, done, todo], "ref")
    my1, minep1 = _update(tile, np.asarray(mine.uca, "float64"),
                          [data, done, todo], "mine")
    _cmp_nan(ref1, my1, msg="round-1 uca")
    np.testing.assert_array_equal(np.asarray(refp1.edge_done),
                                  np.asarray(minep1.edge_done))

    # round 2: the remaining half arrives; todo shrinks to what round 1
    # left unresolved
    data2, done2, todo2 = _edge_dicts(tile.shape)
    data2["left"] = strip * ~half1
    done2["left"] = ~half1
    todo2["left"] = np.asarray(refp1.edge_todo)[:, 0]
    ref2o, refp2 = _update(tile, ref1, [data2, done2, todo2], "ref")
    my2o, minep2 = _update(tile, my1, [data2, done2, todo2], "mine")
    _cmp_nan(ref2o, my2o, msg="round-2 uca")
    np.testing.assert_array_equal(np.asarray(refp2.edge_done),
                                  np.asarray(minep2.edge_done))

    # chained rounds must land on the full-canvas truth in the interior
    seam = np.asarray(full.uca, "float64")[:, cut:]
    _cmp_nan(ref2o[1:-1, 1:-1], seam[1:-1, 1:-1], decimal=8,
             msg="ref chained vs full-canvas interior")
    _cmp_nan(my2o[1:-1, 1:-1], seam[1:-1, 1:-1], decimal=8,
             msg="mine chained vs full-canvas interior")
