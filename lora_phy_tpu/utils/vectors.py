"""Reader for the reference's binary test-vector record format
(reference: scripts/create_binary_vectors.py:33-69, corpus in
/root/reference/vectors_binary/): little-endian, ``u32 count`` header, then
per record: len-prefixed ``test_type``, len-prefixed ``payload``,
``u32 spread_factor``, len-prefixed ``coding_rate``, len-prefixed extra data.
"""

from __future__ import annotations

import dataclasses
import struct


@dataclasses.dataclass
class VectorRecord:
    test_type: str
    payload: bytes
    spread_factor: int
    coding_rate: str
    extra: bytes


def load_binary_vectors(path) -> list[VectorRecord]:
    records: list[VectorRecord] = []
    with open(path, "rb") as f:
        (count,) = struct.unpack("<I", f.read(4))

        def lp() -> bytes:
            (n,) = struct.unpack("<I", f.read(4))
            return f.read(n)

        for _ in range(count):
            test_type = lp().decode("utf-8")
            payload = lp()
            (sf,) = struct.unpack("<I", f.read(4))
            cr = lp().decode("utf-8")
            extra = lp()
            records.append(VectorRecord(test_type, payload, sf, cr, extra))
    return records
