"""R2S operators (reference kolibrie/src/rsp/r2s.rs:14-58).

- RSTREAM: emit the current result.
- ISTREAM: emit rows not present in the previous firing's result (Δ+).
- DSTREAM: emit previous rows absent from the current result (Δ-).

State is one result-set per continuous query — tiny, driver-side here; in
the Structured Streaming compilation the same diff runs against a state
table (see structured.py).
"""

from __future__ import annotations


def _key(row):
    if isinstance(row, dict):
        return tuple(sorted(row.items()))
    if isinstance(row, (list, set)):
        return tuple(row)
    return row


class RStream:
    def eval(self, new_response: list, ts: int) -> list:
        return new_response


class IStream:
    def __init__(self):
        self.last: set = set()

    def eval(self, new_response: list, ts: int) -> list:
        new_set = {_key(r) for r in new_response}
        emitted = [r for r in new_response if _key(r) not in self.last]
        self.last = new_set
        return emitted


class DStream:
    def __init__(self):
        self.last_rows: dict = {}

    def eval(self, new_response: list, ts: int) -> list:
        new_set = {_key(r) for r in new_response}
        emitted = [r for k, r in self.last_rows.items() if k not in new_set]
        self.last_rows = {_key(r): r for r in new_response}
        return emitted


def make_r2s(kind: str):
    return {"RSTREAM": RStream, "ISTREAM": IStream, "DSTREAM": DStream}[kind]()
