"""Streaming, restartable k-mer counting pipelines.

The reference is a leaf library: no I/O, no recovery (SURVEY.md §5 marks
both absent). A production TPU job needs crash-safe long runs. count_fastq
streams a FASTQ through the staged loader (io.iter_fastq_batches: native
scan + host pack + 2-bit upload, prefetch thread), accumulates k-mer counts
on device, and optionally checkpoints progress to disk every N batches so a
killed job resumes where it left off.

Resume correctness rests on deterministic batch framing: for a fixed
(path, batch_size), the loader always yields identical batches in order, so
"skip the first n_batches" replays exactly (deterministic kernels make the
recount of an in-flight batch safe — SURVEY.md §5 recovery plan).

Accumulators:
  * k <= ops.kmer.MAX_DENSE_K: dense [4^k] int32 histogram (device add per
    batch; one psum per batch when a mesh is given).
  * larger k: sparse run lists merged per batch with the same gather-free
    sort + weighted-run primitive the distributed merge uses
    (ops.kmer.weighted_runs_from_sorted); capacity doubles on demand.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .ops import kmer as kmer_ops

CKPT_VERSION = 1


def _merge_runs_host(acc, batch_runs, cap):
    """Merge two run-start lists (device) -> run-start list of size cap."""
    import jax
    import jax.numpy as jnp

    lo1, hi1, ct1 = acc
    lo2, hi2, ct2 = batch_runs
    lo = jnp.concatenate([lo1, lo2])
    hi = jnp.concatenate([hi1, hi2])
    ct = jnp.concatenate([ct1, ct2]).astype(jnp.int32)
    sent = jnp.uint32(0xFFFFFFFF)
    dead = ct == 0
    lo = jnp.where(dead, sent, lo)
    hi = jnp.where(dead, sent, hi)
    hi_s, lo_s, ct_s = jax.lax.sort((hi, lo, ct), num_keys=2)
    lo_u, hi_u, tot, n_u = kmer_ops.weighted_runs_from_sorted(hi_s, lo_s, ct_s)
    # compact to the front so the accumulator stays bounded by #distinct:
    # one sort by (count==0) is stable on the key order
    order_key = (tot == 0).astype(jnp.int32)
    _, lo_c, hi_c, tot_c = jax.lax.sort(
        (order_key, lo_u, hi_u, tot), num_keys=1, is_stable=True
    )
    return (lo_c[:cap], hi_c[:cap], tot_c[:cap]), n_u


def count_fastq(
    path,
    k: int,
    batch_size: int = 4096,
    max_len: Optional[int] = None,
    canonical: bool = False,
    validate: bool = True,
    mesh=None,
    axis: str = "data",
    checkpoint: Optional[str] = None,
    checkpoint_every: int = 50,
    prefetch: int = 2,
    sparse_capacity: int = 1 << 20,
    on_invalid: str = "raise",
    on_progress=None,
    progress_every: int = 50,
):
    """Stream a FASTQ file into k-mer counts, optionally crash-resumable.

    Returns a dense numpy histogram [4^k] for k <= MAX_DENSE_K, else a dict
    {packed_kmer_value: count} (reference README HashMap semantics,
    /root/reference/README.md:164-180, at streaming scale).

    checkpoint: path to an .npz written every `checkpoint_every` batches
    (atomic rename). If the file exists, counting resumes after the batches
    it covers; the finished checkpoint is left in place.
    mesh: optional jax Mesh — dense-mode batches are sharded on `axis` and
    merged with one psum per batch (k <= MAX_DENSE_K only).
    on_invalid: "raise" (reference InvalidBase semantics) or "skip" — drop
    every window containing an N/ambiguous base (parse-time validity mask
    threaded through count_kmers_reads(base_valid=...)).
    on_progress: optional callable receiving a metrics dict every
    `progress_every` batches ({"batches", "reads", "bases",
    "bases_per_sec"} — the SURVEY §5 observability hook; wire it to
    logging/JSON as the deployment prefers).
    """
    import time as _time
    import jax.numpy as jnp

    from . import io as bnio

    if not 1 <= k <= 32:
        from .errors import InvalidLength

        raise InvalidLength(k)
    dense = k <= kmer_ops.MAX_DENSE_K
    if mesh is not None and not dense:
        raise ValueError("mesh counting supports dense k <= MAX_DENSE_K")
    if on_invalid not in ("raise", "skip"):
        raise ValueError(f"on_invalid must be 'raise' or 'skip', got {on_invalid!r}")
    skip = on_invalid == "skip"
    if skip and mesh is not None:
        raise ValueError("on_invalid='skip' is not supported with a mesh yet")

    # -- resume state ---------------------------------------------------------
    start_batch = 0
    hist = None
    acc = None
    cap = int(sparse_capacity)
    if checkpoint and os.path.exists(checkpoint):
        with np.load(checkpoint) as z:
            assert int(z["version"]) == CKPT_VERSION
            assert int(z["k"]) == k and int(z["batch_size"]) == batch_size, (
                "checkpoint was written with different framing parameters"
            )
            start_batch = int(z["n_batches"])
            if dense:
                hist = jnp.asarray(z["hist"])
            else:
                cap = int(z["lo"].shape[0])
                acc = (
                    jnp.asarray(z["lo"]),
                    jnp.asarray(z["hi"]),
                    jnp.asarray(z["counts"]),
                )

    def save(n_batches):
        if not checkpoint:
            return
        tmp = f"{checkpoint}.tmp.{os.getpid()}.npz"
        payload = {
            "version": CKPT_VERSION,
            "k": k,
            "batch_size": batch_size,
            "n_batches": n_batches,
        }
        if dense:
            payload["hist"] = np.asarray(hist, np.int32)
        else:
            payload["lo"] = np.asarray(acc[0], np.uint32)
            payload["hi"] = np.asarray(acc[1], np.uint32)
            payload["counts"] = np.asarray(acc[2], np.int32)
        np.savez_compressed(tmp, **payload)  # keeps the .npz name as-is
        os.replace(tmp, checkpoint)

    if dense and hist is None:
        hist = jnp.zeros(4**k, jnp.int32)
    if not dense and acc is None:
        acc = (
            jnp.full(cap, 0xFFFFFFFF, jnp.uint32),
            jnp.full(cap, 0xFFFFFFFF, jnp.uint32),
            jnp.zeros(cap, jnp.int32),
        )

    # -- stream ---------------------------------------------------------------
    n_batches = start_batch
    n_reads = 0
    n_bases = 0
    t0 = _time.perf_counter()
    for i, item in enumerate(
        bnio.iter_fastq_batches(
            path,
            batch_size,
            max_len=max_len,
            validate=validate and not skip,
            prefetch=prefetch,
            with_validity=skip,
        )
    ):
        if i < start_batch:
            continue  # resume: deterministic framing replays past batches
        batch, base_valid = item if skip else (item, None)
        if base_valid is not None:
            base_valid = jnp.asarray(base_valid)
        if dense:
            if mesh is not None:
                from .parallel import kmer as pkmer, mesh as pmesh

                sharded = pmesh.shard_reads(batch, mesh, axis)
                h = pkmer.count_kmers_sharded(
                    sharded.words, sharded.lengths, k, mesh, axis,
                    canonical=canonical,
                )
            else:
                h = kmer_ops.count_kmers_reads(
                    batch.words, batch.lengths, k, canonical=canonical,
                    base_valid=base_valid,
                )
            hist = hist + h
        else:
            lo, hi, ct, n_u = kmer_ops.count_kmers_runs(
                batch.words, batch.lengths, k, canonical, base_valid
            )
            while True:
                merged, n_unique = _merge_runs_host(acc, (lo, hi, ct), cap)
                if int(n_unique) <= int(0.95 * cap):
                    acc = merged
                    break
                cap *= 2  # rare: re-merge at doubled capacity (recompiles)
                acc = tuple(
                    jnp.concatenate(
                        [a, jnp.full(cap - a.shape[0], f, a.dtype)]
                    )
                    for a, f in zip(acc, (0xFFFFFFFF, 0xFFFFFFFF, 0))
                )
        n_batches = i + 1
        n_reads += len(batch)
        n_bases += int(np.asarray(batch.lengths).sum())
        if checkpoint and (n_batches - start_batch) % checkpoint_every == 0:
            save(n_batches)
        if on_progress and (n_batches - start_batch) % progress_every == 0:
            dt = max(_time.perf_counter() - t0, 1e-9)
            on_progress(
                {
                    "batches": n_batches,
                    "reads": n_reads,
                    "bases": n_bases,
                    "bases_per_sec": n_bases / dt,
                }
            )

    if checkpoint:
        save(n_batches)

    if dense:
        return np.asarray(hist)
    glo, ghi, gct = kmer_ops.compact_runs(*acc)
    return {
        (int(ghi[i]) << 32) | int(glo[i]): int(gct[i]) for i in range(len(gct))
    }
