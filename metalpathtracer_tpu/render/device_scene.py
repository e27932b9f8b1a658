"""DeviceScene: the packed scene + BVH as a JAX pytree of device arrays.

This is the TPU equivalent of the reference's GPU buffer set — the seven
fragment-shader bindings built in `Renderer::buildBuffers` /
`updateVisibleScene` (`MetalCpp Path Tracer/Renderer/Renderer.cpp:114-149,
184-223`): primitives, materials, BVH nodes, and the primitive index
permutation. Scene buffers are small (a few MB even at bunny scale) so under
multi-chip sharding they are fully replicated per chip (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from metalpathtracer_tpu.accel.bvh import BVHArrays, build_bvh
from metalpathtracer_tpu.scene.types import HostScene, PackedScene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceScene:
    # primitives (SoA, padded)
    prim_type: jax.Array  # int32 (P,)
    p0: jax.Array  # float32 (P, 3)
    p1: jax.Array  # float32 (P, 3)
    p2: jax.Array  # float32 (P, 3)
    # materials
    albedo: jax.Array  # float32 (P, 3)
    material_type: jax.Array  # float32 (P,)
    emission_color: jax.Array  # float32 (P, 3)
    emission_power: jax.Array  # float32 (P,)
    fuzz: jax.Array  # float32 (P,)
    # linearized BVH
    node_lo: jax.Array  # float32 (M, 3)
    node_hi: jax.Array  # float32 (M, 3)
    node_a: jax.Array  # int32 (M,)
    node_b: jax.Array  # int32 (M,)
    prim_indices: jax.Array  # int32 (P,)
    # static metadata (not traced)
    num_real: int = dataclasses.field(metadata=dict(static=True))
    max_depth: int = dataclasses.field(metadata=dict(static=True))


def upload_scene(
    packed: PackedScene | HostScene, bvh: BVHArrays | None = None
) -> DeviceScene:
    """Pack (if needed), build the BVH (if not given), and move to device."""
    if isinstance(packed, HostScene):
        packed = packed.pack()
    if bvh is None:
        bvh = build_bvh(packed)

    p = packed.num_padded
    prim_indices = np.zeros(p, np.int32)
    prim_indices[: bvh.prim_indices.shape[0]] = bvh.prim_indices

    return DeviceScene(
        prim_type=jax.numpy.asarray(packed.prim_type),
        p0=jax.numpy.asarray(packed.p0),
        p1=jax.numpy.asarray(packed.p1),
        p2=jax.numpy.asarray(packed.p2),
        albedo=jax.numpy.asarray(packed.albedo),
        material_type=jax.numpy.asarray(packed.material_type),
        emission_color=jax.numpy.asarray(packed.emission_color),
        emission_power=jax.numpy.asarray(packed.emission_power),
        fuzz=jax.numpy.asarray(packed.fuzz),
        node_lo=jax.numpy.asarray(bvh.node_lo),
        node_hi=jax.numpy.asarray(bvh.node_hi),
        node_a=jax.numpy.asarray(bvh.node_a),
        node_b=jax.numpy.asarray(bvh.node_b),
        prim_indices=jax.numpy.asarray(prim_indices),
        num_real=int(packed.num_real),
        max_depth=int(bvh.max_depth),
    )
