"""Subprocess worker for test_distributed: a real two-process
jax.distributed bring-up on CPU (the multi-host path of SURVEY.md §2.3,
scaled down), exercising initialize_distributed's fail-fast wrapper, the
collective health check, cross-process global-array assembly, and a sharded
field op. Run: python dist_worker.py <pid> <nproc> <port>."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecsimd_tpu import parallel

parallel.initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid,
    timeout_s=90,
)

import jax.numpy as jnp
import numpy as np

from ecsimd_tpu import convert
from ecsimd_tpu.ops import solinas
from tests.toy import GOLDILOCKS

n_local = len(jax.local_devices())
assert len(jax.devices()) == nproc * n_local

mesh = parallel.make_mesh()
parallel.health_check(mesh, timeout_s=90)

# global plane array assembled from per-process shards, then a sharded
# field op (lane-local — zero collectives), gathered and checked vs ints
fs = GOLDILOCKS
d = fs.ndigits
per = 2 * n_local
a_ints = [(pid * per + j + 1) * 12345 % fs.p for j in range(per)]
local = np.asarray(convert.ints_to_planes(a_ints, d))
ga = parallel.local_batch_to_global(local, mesh)
sq = jax.jit(lambda x: solinas.fast_sqr(x, fs), out_shardings=parallel.plane_sharding(mesh))(ga)
got = convert.planes_to_ints(np.asarray(jax.device_get(sq.addressable_shards[0].data)))
base = pid * per  # this process holds its own contiguous shard rows? verify per-lane
# check every addressable shard against the oracle
for shard in sq.addressable_shards:
    lo = shard.index[1].start or 0
    vals = convert.planes_to_ints(np.asarray(shard.data))
    for off, v in enumerate(vals):
        j = lo + off
        want = ((j + 1) * 12345 % fs.p) ** 2 % fs.p
        assert v == want, (j, v, want)
print(f"proc {pid}: distributed ok", flush=True)
