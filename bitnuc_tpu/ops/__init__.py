from . import (  # noqa: F401
    analysis,
    codec,
    correct,
    dedupe,
    hamming,
    kmer,
    lookup,
    revcomp,
    setops,
    split,
)
