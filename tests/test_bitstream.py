import numpy as np

from jxl_tiny_tpu.bitstream import BitWriter, BitReader


def test_writer_reader_roundtrip():
    rng = np.random.RandomState(0)
    items = []
    w = BitWriter()
    for _ in range(1000):
        n = int(rng.randint(1, 33))
        v = int(rng.randint(0, 1 << n))
        items.append((n, v))
        w.write(n, v)
    data = w.to_bytes()
    r = BitReader(data)
    for n, v in items:
        assert r.read(n) == v


def test_write_arrays_matches_scalar():
    rng = np.random.RandomState(1)
    n = rng.randint(0, 25, size=500).astype(np.uint8)
    v = (rng.randint(0, 1 << 24, size=500).astype(np.uint64)) & (
        (np.uint64(1) << n.astype(np.uint64)) - np.uint64(1)
    )
    w1 = BitWriter()
    w1.write_arrays(n, v)
    w2 = BitWriter()
    for nn, vv in zip(n, v):
        if nn:
            w2.write(int(nn), int(vv))
    assert w1.to_bytes() == w2.to_bytes()


def test_lsb_first_bit_order():
    w = BitWriter()
    w.write(1, 1)
    w.write(3, 0b101)
    w.write(4, 0xF)
    # bits: 1, 101, 1111 -> byte LSB-first: 1 | 101<<1 | 1111<<4 = 0xFB
    assert w.to_bytes() == bytes([0xFB])


def test_zero_pad_and_append():
    w = BitWriter()
    w.write(3, 5)
    w.zero_pad_to_byte()
    assert w.bits_written == 8
    w.append_bytes_aligned(b"\xab\xcd")
    r = BitReader(w.to_bytes())
    assert r.read(3) == 5
    assert r.read(5) == 0
    assert r.read(8) == 0xAB
    assert r.read(8) == 0xCD
