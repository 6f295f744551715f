"""BLAKE3 known-answer tests (official test-vector inputs)."""

from zklisp_tpu.crypto.blake3 import Hasher, blake3


def _pat(n: int) -> bytes:
    return bytes(i % 251 for i in range(n))


def test_empty():
    assert blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")


def test_one_byte():
    assert blake3(_pat(1)).hex() == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213")


def test_hello_world():
    assert blake3(b"hello world").hex() == (
        "d74981efa70a0c880b8d8c1985d075dbcbf679b99a5f9914e5aaf96b831a9e24")


def test_multi_block_and_multi_chunk_consistency():
    # structural: incremental == one-shot across block/chunk boundaries
    for n in (63, 64, 65, 1023, 1024, 1025, 2048, 2049, 3072, 3073, 5000):
        data = _pat(n)
        h = Hasher()
        h.update(data[: n // 2]).update(data[n // 2:])
        assert h.finalize() == blake3(data), n


def test_output_lengths():
    assert len(blake3(b"x", 16)) == 16
    assert len(blake3(b"x", 64)) == 64
    assert blake3(b"x", 64)[:32] == blake3(b"x", 32)
