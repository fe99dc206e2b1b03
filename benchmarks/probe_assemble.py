"""Assembly stage split (VERDICT r4 item 8): assembly_read_bases_per_sec
is two orders below every other row with no accounting. Split the
bench_assemble workload into its stages, same-run:

  spectrum  — device canonical k-mer runs + host key compaction
  prepare   — rc-union + re-sort + (no clean) of the solid key set
  graph     — _Graph() construction: sorted-join edges + Wyllie rank
  emit      — unitig byte assembly + strand-twin dedupe

Run: python benchmarks/probe_assemble.py   (real TPU)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from bitnuc_tpu import config

config.enable_compilation_cache()
from bitnuc_tpu import assemble
from bitnuc_tpu.ops import kmer as kmer_ops
from bitnuc_tpu.sequence import PackedReads


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 3), "unit": u}), flush=True)


genome_mb, read_len, step, k = 2, 150, 30, 31
rng = np.random.default_rng(17)
n = genome_mb << 20
g = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
starts = np.unique(np.append(np.arange(0, n - read_len + 1, step), n - read_len))
reads = PackedReads.from_ascii(
    g[starts[:, None] + np.arange(read_len)],
    lengths=np.full(len(starts), read_len, np.int32),
)
total_bases = len(starts) * read_len
emit("read_bases", float(total_bases), "bases")

import bench

emit("xor_copy_64", bench.bench_memcpy(64), "GB/s")


def t3(fn):
    best = float("inf")
    out = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


# stage 1: device spectrum -> host solid keys
def spectrum():
    lo, hi, cts, _ = kmer_ops.count_kmers_runs(
        reads.words, reads.lengths, k, canonical=True
    )
    return assemble._runs_to_keys(lo, hi, cts, 1)


t_spec, (keys, cts) = t3(spectrum)
emit("stage_spectrum", t_spec * 1e3, "ms")
emit("n_solid_keys", float(len(keys)), "keys")

# stage 2: prepare (rc-union + sort; no clean in the bench workload)
t_prep, (pkeys, pcts) = t3(
    lambda: assemble.prepare_keys(keys, cts, k, both_strands=True)
)
emit("stage_prepare", t_prep * 1e3, "ms")
emit("n_prepared_keys", float(len(pkeys)), "keys")

# stage 3: graph build (sorted-join edges + Wyllie rank)
t_graph, graph = t3(lambda: assemble._Graph(pkeys, k))
emit("stage_graph", t_graph * 1e3, "ms")

# stage 4: emit + strand-twin dedupe + sort
def emit_stage():
    seqs, circ = assemble.unitigs_from_keys(pkeys, k, _graph=graph)
    seqs, circ = assemble.dedupe_strand_twins(seqs, circ, k)
    return assemble._sort_longest_first(seqs, circ)


t_emit, (seqs, circ) = t3(emit_stage)
emit("stage_emit", t_emit * 1e3, "ms")
gb = g.tobytes()
assert len(seqs) == 1 and seqs[0] in (gb, assemble.rc_ascii(gb))

# end-to-end for the same-run reference
t_all, _ = t3(lambda: assemble.assemble_reads(reads, k, min_count=1))
emit("stage_sum", (t_spec + t_prep + t_graph + t_emit) * 1e3, "ms")
emit("end_to_end", t_all * 1e3, "ms")
emit("end_to_end_rate", total_bases / t_all / 1e6, "Mbases/s")
emit("xor_copy_64_end", bench.bench_memcpy(64), "GB/s")
