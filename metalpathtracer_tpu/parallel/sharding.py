"""Multi-chip rendering: tile and sample sharding over a device mesh.

The reference is strictly single-GPU — its entire parallelism model is the
rasterizer launching one fragment thread per pixel (SURVEY.md §2 note, §5
"Distributed communication backend: none"). The TPU-native scaling axes are:

- **tile sharding**: the pixel grid is split row-block-wise across chips;
  each chip traces only its tile. Embarrassingly parallel; the framebuffer
  gather is the only collective (rides ICI).
- **sample sharding**: every chip renders the full image with a disjoint
  slice of the spp budget; partial sums combine with one `psum`.

Because the RNG streams are positional — a draw depends on (pixel, sample,
bounce), never on lane position (`core/rng.py`) — both shardings produce
BIT-IDENTICAL images to a single device (tested in tests/test_sharding.py),
and the two axes compose into a 2-D mesh ("tiles", "samples").

Scene arrays are a few MB and are replicated per chip; rays never cross
chips. This is the BASELINE config-5 design (1080p tile-sharded progressive
accumulation on v5e-8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from metalpathtracer_tpu.core import rng
from metalpathtracer_tpu.render.integrator import DEFAULT_CONFIG
from metalpathtracer_tpu.render.pipeline import render_tile


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    """1-D mesh over local devices (v5e-8 → 8-way tile sharding)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def make_mesh_2d(n_tiles: int, n_samples: int) -> Mesh:
    """2-D (tiles, samples) mesh for composed tile+sample sharding."""
    import numpy as np

    devices = np.asarray(jax.devices()[: n_tiles * n_samples]).reshape(
        n_tiles, n_samples
    )
    return Mesh(devices, ("tiles", "samples"))


def _check_divisible(height: int, n: int) -> None:
    if height % n != 0:
        raise ValueError(
            f"image height {height} must divide evenly across {n} tile shards"
        )


def render_image_sharded(
    scene,
    camera,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    cfg=DEFAULT_CONFIG,
    mesh: Mesh | None = None,
):
    """Tile-sharded render over a 1-D mesh. Returns (image (H, W, 3), rays).

    Each device traces `height / n` rows; results concatenate along rows.
    Identical output to `render_image` for any device count.
    """
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    _check_divisible(height, n)
    rows_per = height // n

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P("tiles"), P()),
        check_vma=False,  # while_loop carries start as unvarying constants
    )
    def shard_fn(scene, camera):
        i = jax.lax.axis_index("tiles")
        first = i.astype(jnp.uint32) * jnp.uint32(rows_per * width)
        pixel_id = first + jnp.arange(rows_per * width, dtype=jnp.uint32)
        sample_ids = jnp.arange(spp, dtype=jnp.uint32)
        rgb_sum, rays = render_tile(
            scene, camera, width, height, pixel_id, sample_ids,
            rng.seed_from_int(seed), cfg,
        )
        rays = jax.lax.psum(rays, "tiles")
        return rgb_sum.reshape(rows_per, width, 3), rays

    with mesh:
        rgb_sum, rays = jax.jit(shard_fn)(scene, camera)
    return rgb_sum / spp, int(rays)


def render_image_wavefront_sharded(
    scene,
    camera,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    cfg=DEFAULT_CONFIG,
    mesh: Mesh | None = None,
    pool_size: int | None = None,
):
    """Tile-sharded render where each chip runs the persistent-wavefront
    integrator over its own row block — the BASELINE config-5 layout with
    the round's fastest integrator. Each shard's regeneration queue, lane
    pool, and framebuffer scatter are chip-local; the only cross-chip
    traffic is the final framebuffer gather. Bit-identical to the
    single-device wavefront (positional RNG, global pixel ids). Delegates to
    `integrator.trace_wavefront` with a per-shard pixel range, so it honors
    the RenderConfig knobs that path honors (megakernel, bounces_per_iter,
    rr_start, ...); `sort_lanes` applies only on the non-megakernel route.
    """
    from metalpathtracer_tpu.core import rng as _rng
    from metalpathtracer_tpu.render.integrator import trace_wavefront

    if spp <= 0:
        raise ValueError(f"spp must be positive, got {spp}")
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    _check_divisible(height, n)
    rows_per = height // n
    n_local = rows_per * width

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P("tiles"), P()),
        check_vma=False,
    )
    def shard_fn(scene, camera):
        i = jax.lax.axis_index("tiles")
        fb, rays = trace_wavefront(
            scene, camera, width, height, spp, _rng.seed_from_int(seed),
            cfg, pool_size,
            pixel_offset=i.astype(jnp.uint32) * jnp.uint32(n_local),
            n_pixels=n_local,
        )
        return fb.reshape(rows_per, width, 3), jax.lax.psum(rays, "tiles")

    with mesh:
        rgb_sum, rays = jax.jit(shard_fn)(scene, camera)
    return rgb_sum / spp, int(rays)


def render_image_sample_sharded(
    scene,
    camera,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    cfg=DEFAULT_CONFIG,
    mesh: Mesh | None = None,
):
    """Sample-sharded render: chip i traces samples [i*spp/n, (i+1)*spp/n);
    partial framebuffer sums combine with one psum over ICI."""
    if mesh is None:
        mesh = make_mesh(axis="samples")
    n = mesh.devices.size
    if spp % n != 0:
        raise ValueError(f"spp {spp} must divide evenly across {n} shards")
    spp_per = spp // n

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(scene, camera):
        i = jax.lax.axis_index("samples")
        pixel_id = jnp.arange(width * height, dtype=jnp.uint32)
        sample_ids = i.astype(jnp.uint32) * jnp.uint32(spp_per) + jnp.arange(
            spp_per, dtype=jnp.uint32
        )
        rgb_sum, rays = render_tile(
            scene, camera, width, height, pixel_id, sample_ids,
            rng.seed_from_int(seed), cfg,
        )
        rgb_sum = jax.lax.psum(rgb_sum, "samples")
        rays = jax.lax.psum(rays, "samples")
        return rgb_sum.reshape(height, width, 3), rays

    with mesh:
        rgb_sum, rays = jax.jit(shard_fn)(scene, camera)
    return rgb_sum / spp, int(rays)


def render_image_sharded_2d(
    scene,
    camera,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    cfg=DEFAULT_CONFIG,
    mesh: Mesh | None = None,
):
    """Composed tile x sample sharding over a 2-D mesh — the full BASELINE
    config-5 layout. Tiles split rows; samples split spp; the sample-axis
    psum is the only collective."""
    if mesh is None:
        mesh = make_mesh_2d(jax.device_count() // 2, 2)
    nt = mesh.shape["tiles"]
    ns = mesh.shape["samples"]
    _check_divisible(height, nt)
    if spp % ns != 0:
        raise ValueError(f"spp {spp} must divide across {ns} sample shards")
    rows_per = height // nt
    spp_per = spp // ns

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P("tiles"), P()),
        check_vma=False,
    )
    def shard_fn(scene, camera):
        ti = jax.lax.axis_index("tiles")
        si = jax.lax.axis_index("samples")
        first = ti.astype(jnp.uint32) * jnp.uint32(rows_per * width)
        pixel_id = first + jnp.arange(rows_per * width, dtype=jnp.uint32)
        sample_ids = si.astype(jnp.uint32) * jnp.uint32(spp_per) + jnp.arange(
            spp_per, dtype=jnp.uint32
        )
        rgb_sum, rays = render_tile(
            scene, camera, width, height, pixel_id, sample_ids,
            rng.seed_from_int(seed), cfg,
        )
        rgb_sum = jax.lax.psum(rgb_sum, "samples")
        rays = jax.lax.psum(rays, ("tiles", "samples"))
        return rgb_sum.reshape(rows_per, width, 3), rays

    with mesh:
        rgb_sum, rays = jax.jit(shard_fn)(scene, camera)
    return rgb_sum / spp, int(rays)
