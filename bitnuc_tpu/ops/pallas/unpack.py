"""Pallas unpack kernel (placeholder until the kernel milestone)."""


def decode_reads_pallas(words, lengths, max_len=None):
    raise NotImplementedError
