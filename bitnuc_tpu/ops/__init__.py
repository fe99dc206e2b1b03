from . import (  # noqa: F401
    align,
    analysis,
    codec,
    correct,
    dedupe,
    hamming,
    kmer,
    lookup,
    pileup,
    revcomp,
    setops,
    split,
)
