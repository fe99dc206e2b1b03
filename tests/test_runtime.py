"""Multi-host runtime: a real 2-process CPU jax.distributed cluster.

The reference has nothing distributed (SURVEY.md §2.3); this validates the
pure north-star surface: parallel.runtime.initialize must wire two OS
processes into one JAX runtime (gloo CPU collectives) such that a psum
crosses the process boundary. Also guards the init-ordering contract:
runtime.is_initialized() must not initialize the backend as a side effect.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly 1 CPU device per process
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from bitnuc_tpu.parallel import runtime

# the state probe must not initialize the backend (the round-1 bug: calling
# jax.process_count() in the guard locked in a single-process runtime)
assert not runtime.is_initialized()

if len(sys.argv) > 3 and sys.argv[3] == "env":
    # launcher-style env spec instead of explicit arguments
    os.environ["JAX_COORDINATOR_ADDRESS"] = sys.argv[1]
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = sys.argv[2]
    runtime.initialize()
else:
    runtime.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
assert runtime.is_initialized()
runtime.initialize()  # idempotent second call is a no-op

info = runtime.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 2, info

import numpy as np
from jax.sharding import PartitionSpec as P, NamedSharding

mesh = jax.make_mesh((2,), ("x",))
local = np.full((1,), jax.process_index() + 1, np.int32)
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("x")), local, (2,))
out = jax.jit(
    lambda a: jax.shard_map(
        lambda s: jax.lax.psum(s, "x"), mesh=mesh, in_specs=P("x"), out_specs=P("x")
    )(a)
)(arr)
vals = [int(np.asarray(s.data)[0]) for s in out.addressable_shards]
assert all(v == 3 for v in vals), vals  # 1 + 2 summed across processes
print("PSUM_OK", jax.process_index(), flush=True)

# -- a real framework workload across the process boundary ------------------
# Distributed k-mer counting: each process holds HALF the batch, the dense
# histograms merge with one psum over the 2-process gloo mesh, and the
# replicated result must equal the single-process full-batch count AND the
# host dict oracle. This is the multi-HOST claim backed by a framework op,
# not a bare psum.
from bitnuc_tpu import oracle
from bitnuc_tpu.ops import kmer as kmer_ops
from bitnuc_tpu.parallel import count_kmers_sharded
from bitnuc_tpu.sequence import PackedReads

rng = np.random.default_rng(7)
B, k = 8, 5
seqs = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 50)) for _ in range(B)]
full = PackedReads.from_ascii(seqs)
words_np = np.asarray(full.words)
lens_np = np.asarray(full.lengths, np.int32)
half = B // 2
lo = jax.process_index() * half
sh_w = NamedSharding(mesh, P("x", None))
sh_l = NamedSharding(mesh, P("x"))
gw = jax.make_array_from_process_local_data(sh_w, words_np[lo:lo + half], words_np.shape)
gl = jax.make_array_from_process_local_data(sh_l, lens_np[lo:lo + half], lens_np.shape)
hist = count_kmers_sharded(gw, gl, k, mesh, axis="x")
got = np.asarray(hist.addressable_shards[0].data)  # replicated output
want = np.asarray(kmer_ops.count_kmers_dense(full.words, full.lengths, k))
assert np.array_equal(got, want), (got.sum(), want.sum())
expect = np.zeros(4 ** k, np.int64)
for s in seqs:
    for key, c in oracle.count_kmers(s, k).items():
        expect[key] += c
assert np.array_equal(got, expect)
print("KMERS_OK", jax.process_index(), flush=True)
"""


import pytest


@pytest.mark.parametrize("spec", ["args", "env"])
def test_two_process_psum(tmp_path, spec):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    addr = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i), spec],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))},
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PSUM_OK {i}" in out, out
        assert f"KMERS_OK {i}" in out, out


def test_single_process_noop():
    # in-process: no args + no cluster env -> no-op, backend untouched by probe
    from bitnuc_tpu.parallel import runtime

    runtime.initialize()
    assert not runtime.is_initialized()
