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
