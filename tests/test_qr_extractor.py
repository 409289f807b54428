"""QR extractor chip against the reference's 1137-byte V2 QR test vector
(golden fixture extracted from /root/reference/src/lib.rs:652-743; expected
field values per the native extraction at lib.rs:745-850).
"""
import json
import os

import pytest

from halo2tpu.fields.bn254 import R
from halo2tpu.gadgets.flexgate import FlexGateConfig, GateChip
from halo2tpu.gadgets.qr_extractor import ExtractorChip, ExtractorConfig
from halo2tpu.gadgets.range import RangeChip, RangeStrategyConfig
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.mock import MockProver

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "qr_msg.json")


@pytest.fixture(scope="module")
def qr():
    with open(GOLDEN) as f:
        return json.load(f)


class ExtractorHarness(Circuit):
    def __init__(self, data, body):
        self.data = bytes(data)
        self.body = body

    def configure(self, cs):
        gcfg = FlexGateConfig.configure(cs, 8)
        rcfg = RangeStrategyConfig.configure(cs, gcfg, 8, 2)
        ecfg = ExtractorConfig.configure(cs)
        return gcfg, rcfg, ecfg

    def synthesize(self, config, asn):
        gcfg, rcfg, ecfg = config
        gate = GateChip(gcfg, asn)
        rng = RangeChip(rcfg, gate, asn)
        rng.load_table()
        ext = ExtractorChip(ecfg, gate, asn)
        cells = [gate.load_witness(b) for b in self.data]
        ext.load_data(cells)
        self.body(gate, rng, ext, asn)


def run(data, body, k=11, should_pass=True):
    mp = MockProver.run(k, ExtractorHarness(data, body), [])
    fails = mp.verify()
    if should_pass:
        assert not fails, fails[:3]
    else:
        assert fails
    return fails


def test_field_extraction_matches_reference(qr):
    msg, delims = qr["msg"], qr["delimiter_indices"]
    got = {}

    def body(gate, rng, ext, asn):
        # timestamp: year@d2+5..+8, month +9..10, day +11..12, hour +13..14
        d2 = ext.delimiter_pos1(2)
        got["year"] = ext.packed_digits(d2, [5, 6, 7, 8], rng).value
        got["month"] = ext.packed_digits(d2, [9, 10], rng).value
        got["day"] = ext.packed_digits(d2, [11, 12], rng).value
        got["hour"] = ext.packed_digits(d2, [13, 14], rng).value
        # dob: day@d4+1..2, month@d4+4..5, year@d4+7..10
        d4 = ext.delimiter_pos1(4)
        got["bday"] = ext.packed_digits(d4, [1, 2], rng).value
        got["bmonth"] = ext.packed_digits(d4, [4, 5], rng).value
        got["byear"] = ext.packed_digits(d4, [7, 8, 9, 10], rng).value
        # gender: byte at d5+1
        d5 = ext.delimiter_pos1(5)
        got["gender"] = ext.access_offset(d5, 1).value
        # pincode: 6 digits at d11+1..6
        d11 = ext.delimiter_pos1(11)
        got["pincode"] = ext.packed_digits(
            d11, [1, 2, 3, 4, 5, 6], rng).value
        # state bytes d13+1 .. d14-1
        d13 = ext.delimiter_pos1(13)
        got["state"] = bytes(
            ext.access_offset(d13, 1 + j).value for j in range(5))

    run(msg, body)
    # native recomputation (lib.rs:749-850 semantics)
    def digits(lo, n):
        return int("".join(chr(b) for b in msg[lo:lo + n]))
    assert got["year"] == digits(delims[1] + 5, 4) == 2024
    assert got["month"] == digits(delims[1] + 9, 2)
    assert got["day"] == digits(delims[1] + 11, 2)
    assert got["hour"] == digits(delims[1] + 13, 2)
    assert got["bday"] == digits(delims[3] + 1, 2) == 1
    assert got["bmonth"] == digits(delims[3] + 4, 2) == 1
    assert got["byear"] == digits(delims[3] + 7, 4) == 1984
    assert got["gender"] == msg[delims[4] + 1] == ord("M")
    assert got["pincode"] == 110051
    assert got["state"] == b"Delhi"


def test_delimiter_forgery_rejected(qr):
    """Claiming a wrong position for a delimiter must fail the qr_delim
    lookup."""
    msg = qr["msg"]

    class Cheat(ExtractorHarness):
        def synthesize(self, config, asn):
            gcfg, rcfg, ecfg = config
            gate = GateChip(gcfg, asn)
            ext = ExtractorChip(ecfg, gate, asn)
            cells = [gate.load_witness(b) for b in self.data]
            ext.load_data(cells)
            p = ext.delimiter_pos1(2)
            asn.advice[p.col.index][p.row] = p.value + 1  # shift position

    mp = MockProver.run(11, Cheat(bytes(msg), None), [])
    assert mp.verify()


def test_access_forgery_rejected(qr):
    msg = qr["msg"]

    class Cheat(ExtractorHarness):
        def synthesize(self, config, asn):
            gcfg, rcfg, ecfg = config
            gate = GateChip(gcfg, asn)
            ext = ExtractorChip(ecfg, gate, asn)
            cells = [gate.load_witness(b) for b in self.data]
            ext.load_data(cells)
            p = gate.load_constant(10)  # pos1=10
            b = ext.access(p)
            asn.advice[b.col.index][b.row] = (b.value + 1) % R

    mp = MockProver.run(11, Cheat(bytes(msg), None), [])
    assert mp.verify()


def test_is255_flag_forgery_rejected(qr):
    msg = qr["msg"]

    class Cheat(ExtractorHarness):
        def synthesize(self, config, asn):
            gcfg, rcfg, ecfg = config
            gate = GateChip(gcfg, asn)
            ext = ExtractorChip(ecfg, gate, asn)
            cells = [gate.load_witness(b) for b in self.data]
            ext.load_data(cells)
            # claim byte 0 (value '8'=56) is a delimiter
            c = ecfg.cols
            asn.advice[c["is255"].index][0] = 1

    mp = MockProver.run(11, Cheat(bytes(msg), None), [])
    assert mp.verify()
