"""Execute the README's python code blocks — the analog of the reference's
doctests (its ///-examples compile and run under cargo test and double as
the API contract spec)."""

import re
import textwrap
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_readme_code_blocks(tmp_path):
    readme = Path(__file__).resolve().parent.parent / "README.md"
    blocks = re.findall(r"```python\n(.*?)```", readme.read_text(), re.DOTALL)
    assert blocks, "README has no python blocks"

    # provide the inputs the snippets reference
    import bitnuc_tpu as bn

    rng = np.random.default_rng(0)
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=64))
        for _ in range(8)
    ]
    fq = tmp_path / "reads.fq.gz"
    import gzip

    fq.write_bytes(
        gzip.compress(
            b"".join(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * 64) for i, s in enumerate(seqs))
        )
    )
    genome = bytes(
        rng.choice(np.frombuffer(b"ACGT", np.uint8), size=4000)
    )
    env = {
        "list_of_reads": seqs,
        "seqs": seqs,
        "query_words": bn.PackedReads.from_ascii(seqs).words[0],
        "query_batch": bn.PackedReads.from_ascii(seqs).words[:4],
        "genome_bytes": genome,
        "reads": bn.PackedReads.from_ascii(
            [genome[500:650], genome[2000:2150]]
        ),
    }
    code = "\n".join(textwrap.dedent(b) for b in blocks).replace('"reads.fq.gz"', repr(str(fq))).replace(
        '"ckpt.npz"', repr(str(tmp_path / "ckpt.npz"))
    ).replace('"count.ckpt.npz"', repr(str(tmp_path / "count.ckpt.npz")))
    exec(code, env)  # noqa: S102 — the point of the test

    # spot-check the claims made inline in block 1
    assert env["bn"].as_2bit(b"ACGT") == 0b11100100
    assert env["bn"].from_2bit(0b11100100, 4) == b"ACGT"
