import numpy as np
import pytest

from metalpathtracer_tpu.accel import build_bvh, build_bvh_from_aabbs, validate_bvh
from metalpathtracer_tpu.accel.native import build_bvh_native, native_available
from metalpathtracer_tpu.scene import presets

needs_native = pytest.mark.skipif(
    not native_available(), reason="native builder not built (make -C native)"
)


@needs_native
def test_native_matches_numpy_structure():
    packed = presets.random_tri_cloud(3000, seed=7).pack()
    lo, hi = packed.aabbs()
    lo, hi = lo[: packed.num_real], hi[: packed.num_real]
    b_nat = build_bvh_native(lo, hi)
    b_np = build_bvh_from_aabbs(lo, hi)
    validate_bvh(b_nat, lo, hi)
    # same algorithm → same node count and identical root box
    assert b_nat.num_nodes == b_np.num_nodes
    np.testing.assert_allclose(b_nat.node_lo[0], b_np.node_lo[0])
    np.testing.assert_allclose(b_nat.node_hi[0], b_np.node_hi[0])
    assert b_nat.node_b[b_nat.node_b > 0].max() <= 8


@needs_native
def test_native_bunny_scene():
    import os

    from metalpathtracer_tpu.scene import load_scene_xml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    packed = load_scene_xml(os.path.join(repo, "scenes", "reference.xml")).pack()
    lo, hi = packed.aabbs()
    lo, hi = lo[: packed.num_real], hi[: packed.num_real]
    b = build_bvh_native(lo, hi)
    validate_bvh(b, lo, hi)


@needs_native
def test_build_bvh_backend_selection():
    packed = presets.cornell_spheres().pack()
    b = build_bvh(packed, backend="native")
    lo, hi = packed.aabbs()
    validate_bvh(b, lo[: packed.num_real], hi[: packed.num_real])


def test_build_bvh_numpy_backend_always_works():
    packed = presets.cornell_spheres().pack()
    b = build_bvh(packed, backend="numpy")
    assert b.num_nodes >= 1
