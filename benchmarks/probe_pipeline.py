"""Pipeline burst-size probe (VERDICT r3 item 8): is the staged FASTQ
pipeline's wall rate h2d-burst-dependent like d2d bandwidth? Runs
bench_pipeline at increasing batch sizes (upload burst = batch * W * 4
bytes of packed words) plus loader-only drains, same run.

Run: python benchmarks/probe_pipeline.py   (real TPU)
"""
import json
import sys

sys.path.insert(0, "/root/repo")
from bitnuc_tpu import config

config.enable_compilation_cache()
import bench


def emit(n, v, u):
    print(json.dumps({"probe": n, "value": round(v, 2), "unit": u}), flush=True)


emit("xor_copy_128", bench.bench_memcpy(128), "GB/s")
for b in (16384, 65536, 262144):
    mb = b * 80 / (1 << 20)  # packed words per upload (300bp -> 20 u32)
    emit(f"pipeline_staged_b{b}_({mb:.0f}MBup)",
         bench.bench_pipeline(staged=True, batch=b) / 1e6, "Mbases/s")
    emit(f"loader_only_b{b}",
         bench.bench_loader_only(batch=b) / 1e6, "Mbases/s")
emit("parse_only", bench.bench_parse_only() / 1e6, "Mbases/s")
emit("xor_copy_128_end", bench.bench_memcpy(128), "GB/s")
