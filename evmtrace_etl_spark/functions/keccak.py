"""Pure-Python Keccak-256 (original Keccak padding, as used by Ethereum).

Implemented from the public Keccak specification (FIPS-202 permutation with
the pre-standard 0x01 domain padding).  Needed only for EIP-55 address
checksumming at the sink (reference calls ethers' ``to_checksum``,
src/types/etl_result.rs:166-172); hashlib's sha3_256 uses the SHA-3 0x06
padding and yields different digests, so it cannot be used.

This runs driver/executor-side inside a Pandas UDF over the (small) final
output batches — it is deliberately not in any hot path.
"""

from __future__ import annotations

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK = (1 << 64) - 1


def _rotl(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(a: list[list[int]]) -> None:
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y]) & _MASK
                a[x][y] &= _MASK
        # iota
        a[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (Ethereum's hash; NOT hashlib sha3_256)."""
    rate = 136  # 1088-bit rate for 256-bit output
    # pad10*1 with Keccak domain bit 0x01
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80

    a = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            a[i % 5][i // 5] ^= lane
        _keccak_f(a)

    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        out += a[i % 5][i // 5].to_bytes(8, "little")
    return bytes(out)


def to_checksum_address(address: str) -> str:
    """EIP-55 mixed-case checksum of a ``0x…`` hex address (any case in)."""
    body = address.lower().removeprefix("0x")
    digest = keccak256(body.encode("ascii")).hex()
    chars = [
        ch.upper() if int(digest[i], 16) >= 8 else ch for i, ch in enumerate(body)
    ]
    return "0x" + "".join(chars)
