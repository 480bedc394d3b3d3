"""Topology suite: connected components, holes/voids census, extrema map,
convex segmentation, resample."""
import numpy as np

import jax
import jax.numpy as jnp

from sdf_tools_tpu.grid import CollisionMap, GridMeta, make_origin_transform
from sdf_tools_tpu.ops import edt, topology


def _meta(shape, res=0.1):
    return GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, shape)


def _scipy_cc(mask):
    from scipy import ndimage

    lab, n = ndimage.label(mask, structure=ndimage.generate_binary_structure(3, 1))
    return lab, n


def test_connected_components_vs_scipy():
    rng = np.random.default_rng(0)
    mask = rng.random((16, 14, 12)) < 0.3
    eligible = jnp.asarray(mask)
    comp, n = topology.connected_components_by_key(
        eligible, jnp.ones(mask.shape, jnp.int32)
    )
    comp = np.asarray(comp)
    ref_lab, ref_n = _scipy_cc(mask)
    assert int(n) == ref_n
    # same partition (label values may differ only by consistent bijection)
    for c in range(1, ref_n + 1):
        ours = comp[ref_lab == c]
        assert (ours == ours[0]).all() and ours[0] != 0


def test_connected_components_label_order():
    """Labels must follow raster-scan discovery order like the reference."""
    mask = np.zeros((4, 4, 4), bool)
    mask[3, 3, 3] = True  # discovered last -> higher label
    mask[0, 0, 1] = True  # discovered first
    comp, n = topology.connected_components_by_key(
        jnp.asarray(mask), jnp.ones(mask.shape, jnp.int32)
    )
    comp = np.asarray(comp)
    assert int(n) == 2
    assert comp[0, 0, 1] == 1
    assert comp[3, 3, 3] == 2


def test_update_connected_components_binary():
    occ = np.zeros((8, 8, 2), np.float32)
    occ[1:3, 1:3, :] = 1.0
    occ[5:7, 5:7, :] = 1.0
    cmap = CollisionMap.create(occ, _meta((8, 8, 2)))
    cmap2, n = topology.update_connected_components(cmap)
    comp = np.asarray(cmap2.component)
    # free space is one component + two boxes = 3
    assert int(n) == 3
    assert comp[0, 0, 0] == comp[7, 0, 0]  # free connected around boxes
    assert comp[1, 1, 0] != comp[5, 5, 0]


def test_holes_voids_solid_cube():
    lab = np.zeros((8, 8, 8), np.int32)
    lab[2:6, 2:6, 2:6] = 1
    holes, voids = topology.component_holes_and_voids(jnp.asarray(lab), 1)
    assert (int(holes), int(voids)) == (0, 0)


def test_holes_voids_torus():
    # square torus: 6x6x2 block with a 2x2 hole through z
    lab = np.zeros((10, 10, 6), np.int32)
    lab[2:8, 2:8, 2:4] = 1
    lab[4:6, 4:6, 2:4] = 0
    holes, voids = topology.component_holes_and_voids(jnp.asarray(lab), 1)
    assert int(voids) == 0
    assert int(holes) == 1


def test_holes_voids_hollow_cube():
    lab = np.zeros((10, 10, 10), np.int32)
    lab[2:8, 2:8, 2:8] = 1
    lab[4:6, 4:6, 4:6] = 0  # internal cavity
    holes, voids = topology.component_holes_and_voids(jnp.asarray(lab), 1)
    assert int(voids) == 1
    # reference convention: raw = 1 + (M5+2M6-M3)/8 = -1 (two genus-0
    # surfaces each contribute M3=8), holes = raw + voids = 0
    assert int(holes) == 0


def test_compute_component_topology_multi():
    lab = np.zeros((12, 8, 8), np.int32)
    lab[1:4, 1:4, 1:4] = 1  # solid
    lab[6:11, 1:6, 1:3] = 2  # torus
    lab[7:10, 2:5, 1:3] = 0
    lab[8, 3, 1:3] = 2  # plug partially: make genus-1 ring
    # simpler: rebuild clean ring
    lab[6:11, 1:6, 1:3] = 2
    lab[7:10, 2:5, 1:3] = 0
    out = topology.compute_component_topology(jnp.asarray(lab), 2)
    assert out.shape == (2, 2)
    assert tuple(out[0]) == (0, 0)
    assert tuple(out[1]) == (1, 0)


def test_surface_masks():
    mask = np.zeros((6, 6, 6), bool)
    mask[1:5, 1:5, 1:5] = True
    surf = np.asarray(topology.surface_mask_26(jnp.asarray(mask)))
    assert surf[1, 1, 1] and surf[1, 3, 3]
    assert not surf[2, 2, 2]  # strict interior of the cube
    assert not surf[0, 0, 0]  # not filled

    lab = mask.astype(np.int32)
    csurf = np.asarray(topology.component_surface_mask(jnp.asarray(lab)))
    assert csurf[1, 3, 3]
    assert not csurf[2, 3, 3]  # interior cell, all 6 neighbors same label

    corners = np.asarray(topology.candidate_corner_mask(jnp.asarray(lab)))
    assert corners[1, 1, 1]  # cube corner has 3 differing neighbors
    assert not corners[2, 3, 3]


def test_candidate_corner_ignores_out_of_grid_neighbors():
    """Reference CheckIfCandidateCorner only counts in-bounds neighbors
    (collision_map.hpp:549-619): a uniform grid has NO candidate corners,
    even at grid borders/corners where 2-3 neighbors are out of grid."""
    lab = np.ones((4, 5, 6), np.int32)
    corners = np.asarray(topology.candidate_corner_mask(jnp.asarray(lab)))
    assert not corners.any()
    # a genuine interior corner still fires on the border: two different
    # in-bounds neighbors
    lab2 = np.ones((4, 5, 6), np.int32)
    lab2[0, 0, 0] = 2
    lab2[1, 0, 0] = 3
    lab2[0, 1, 0] = 3
    c2 = np.asarray(topology.candidate_corner_mask(jnp.asarray(lab2)))
    assert c2[0, 0, 0]


def test_local_extrema_map_sphere():
    n, res = 16, 0.1
    c = (n - 1) / 2.0
    ii = np.arange(n)
    d2 = (
        (ii[:, None, None] - c) ** 2
        + (ii[None, :, None] - c) ** 2
        + (ii[None, None, :] - c) ** 2
    )
    mask = d2 <= 5**2
    meta = _meta((n, n, n), res)
    sdf, _ = edt.extract_signed_distance_field(jnp.asarray(mask), meta, oob_value=1e3)
    ext = np.asarray(topology.local_extrema_map(sdf))
    assert ext.shape == (n, n, n, 3)
    # interior cells walk to the sphere center region (distance maximum)
    center_world = (c + 0.5) * res
    inner = ext[6:10, 6:10, 6:10]
    assert np.isfinite(inner).all()
    assert np.abs(inner - center_world).max() < 4 * res
    # far-corner free cells walk away from the obstacle; extrema off-grid or
    # at boundary cells
    assert np.isinf(ext[0, 0, 0]).all() or np.isfinite(ext[0, 0, 0]).all()


def test_convex_segments_two_boxes():
    from sdf_tools_tpu.grid import TaggedCollisionMap

    n = 16
    occ = np.zeros((n, n, 4), np.float32)
    obj = np.zeros((n, n, 4), np.uint32)
    occ[2:5, 2:5, 1:3] = 1.0
    obj[2:5, 2:5, 1:3] = 1
    occ[10:13, 10:13, 1:3] = 1.0
    obj[10:13, 10:13, 1:3] = 1
    meta = _meta((n, n, 4))
    tmap = TaggedCollisionMap.create(occ, obj, meta)
    sdf, _ = edt.extract_signed_distance_field(
        jnp.asarray(occ > 0.5), meta, oob_value=np.inf, add_virtual_border=True
    )
    seg, count = topology.convex_segments(tmap, sdf, connected_threshold=0.3)
    seg = np.asarray(seg)
    assert int(count) >= 2
    # the two boxes land in different segments
    assert seg[3, 3, 1] != 0 and seg[11, 11, 1] != 0
    assert seg[3, 3, 1] != seg[11, 11, 1]


def test_resample_nearest():
    vals = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    meta = _meta((4, 4, 4), res=0.2)
    out, new_meta = topology.resample_nearest(jnp.asarray(vals), meta, 0.1)
    assert out.shape == (8, 8, 8)
    assert new_meta.shape == (8, 8, 8)
    np.testing.assert_allclose(np.asarray(out)[0:2, 0:2, 0:2], vals[0, 0, 0])


def test_census_matches_per_component():
    """One-pass census == per-component loop on random multi-component grids."""
    rng = np.random.default_rng(3)
    for shape, p in (((10, 9, 8), 0.35), ((12, 12, 6), 0.5)):
        mask = rng.random(shape) < p
        comp, n = topology.connected_components_by_key(
            jnp.asarray(mask), jnp.asarray(mask, jnp.int32)
        )
        n = int(n)
        census = np.asarray(topology.component_topology_census(comp, n))
        for c in range(1, n + 1):
            h, v = topology.component_holes_and_voids(comp, jnp.int32(c))
            assert (census[c - 1, 0], census[c - 1, 1]) == (int(h), int(v)), (
                shape, c,
            )


def test_census_no_recompile_across_component_counts():
    """Scene loops with varying n_components must reuse ONE compiled census
    (the count is data; only the power-of-two padded bound is static)."""
    mask = np.zeros((20, 9, 8), bool)
    for i in range(5):  # five separated boxes -> exactly 5 components
        mask[4 * i : 4 * i + 2, 2:5, 2:5] = True
    comp, n = topology.connected_components_by_key(
        jnp.asarray(mask), jnp.asarray(mask, jnp.int32)
    )
    n = int(n)
    assert n == 5
    # counts 1..5 all share the padded bound of 8 -> at most ONE compile
    before = topology._census_padded._cache_size()
    outs = {m: np.asarray(topology.component_topology_census(comp, m))
            for m in range(1, n + 1)}
    added = topology._census_padded._cache_size() - before
    assert added <= 1, f"census recompiled {added} times for counts 1..{n}"
    full = outs[n]
    for m in range(1, n + 1):
        assert outs[m].shape == (m, 2)
        np.testing.assert_array_equal(outs[m], full[:m])
    assert topology.component_topology_census(comp, 0).shape == (0, 2)


def test_census_torus_and_hollow_cube_joint():
    """Torus and hollow cube as components of ONE grid, censused jointly."""
    lab = np.zeros((24, 10, 10), np.int32)
    lab[2:8, 2:8, 2:4] = 1
    lab[4:6, 4:6, 2:4] = 0  # torus (genus 1)
    lab[12:20, 1:9, 1:9] = 2
    lab[14:18, 3:7, 3:7] = 0  # hollow cube (1 void)
    out = np.asarray(topology.component_topology_census(jnp.asarray(lab), 2))
    assert tuple(out[0]) == (1, 0)
    assert tuple(out[1]) == (0, 1)
