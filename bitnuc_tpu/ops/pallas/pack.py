"""Pallas pack kernel (placeholder until the kernel milestone)."""


def encode_reads_pallas(ascii_u8, lengths, n_words=None):
    raise NotImplementedError
