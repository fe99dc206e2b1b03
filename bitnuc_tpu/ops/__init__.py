from . import analysis, codec, hamming, kmer, revcomp, split  # noqa: F401
