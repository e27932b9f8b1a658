import os

import numpy as np
import pytest

from metalpathtracer_tpu.accel import build_bvh, build_bvh_from_aabbs, validate_bvh
from metalpathtracer_tpu.scene import load_scene_xml, presets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bvh_invariants_cornell():
    packed = presets.cornell_spheres().pack()
    bvh = build_bvh(packed)
    lo, hi = packed.aabbs()
    validate_bvh(bvh, lo[: packed.num_real], hi[: packed.num_real])


def test_bvh_invariants_bunny():
    scene = load_scene_xml(os.path.join(REPO, "scenes", "reference.xml"))
    packed = scene.pack()
    bvh = build_bvh(packed)
    lo, hi = packed.aabbs()
    validate_bvh(bvh, lo[: packed.num_real], hi[: packed.num_real])
    # leaf-size discipline: no leaf larger than 8 (reference Scene.h:223)
    leaf_counts = bvh.node_b[bvh.node_b > 0]
    assert leaf_counts.max() <= 8
    # a 4971-prim scene must actually subdivide
    assert bvh.num_nodes > 500
    assert bvh.max_depth < 64  # traversal stack bound (PathTracing.h:86)


def test_bvh_single_prim_and_small():
    lo = np.zeros((1, 3), np.float32)
    hi = np.ones((1, 3), np.float32)
    bvh = build_bvh_from_aabbs(lo, hi)
    assert bvh.num_nodes == 1 and bvh.node_b[0] == 1
    validate_bvh(bvh, lo, hi)


def test_bvh_identical_centroids_terminates():
    # 100 coincident boxes: SAH has no spread; builder must not recurse forever
    lo = np.zeros((100, 3), np.float32)
    hi = np.ones((100, 3), np.float32)
    bvh = build_bvh_from_aabbs(lo, hi)
    validate_bvh(bvh, lo, hi)


def test_bvh_quality_random_cloud():
    packed = presets.random_tri_cloud(2000, seed=1).pack()
    bvh = build_bvh(packed)
    lo, hi = packed.aabbs()
    validate_bvh(bvh, lo[: packed.num_real], hi[: packed.num_real])
    # SAH should produce a reasonably balanced tree for a uniform cloud
    assert bvh.max_depth <= 40


def test_bvh_empty_raises():
    with pytest.raises(ValueError):
        build_bvh_from_aabbs(np.zeros((0, 3)), np.zeros((0, 3)))


def test_bvh_degenerate_boxes_respect_leaf_size():
    # >8 coincident/zero-area boxes: SAH degenerates but leaves must still
    # stay within LEAF_SIZE (traversal only tests 8 prims per leaf)
    lo = np.zeros((20, 3), np.float32)
    hi = np.zeros((20, 3), np.float32)  # zero-area boxes → parent SA = 0
    bvh = build_bvh_from_aabbs(lo, hi)
    validate_bvh(bvh, lo, hi)
    assert bvh.node_b[bvh.node_b > 0].max() <= 8
