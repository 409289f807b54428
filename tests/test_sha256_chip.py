"""SHA-256 chip (SURVEY N12): in-circuit digests match hashlib bit-for-bit
and the constraint set is satisfiable; forged digest bits are rejected.
"""
import hashlib

import pytest

from halo2tpu.fields.bn254 import R
from halo2tpu.gadgets.flexgate import FlexGateConfig, GateChip
from halo2tpu.gadgets.sha256 import Sha256Chip, Sha256Config, pad_message
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.mock import MockProver


class ShaHarness(Circuit):
    def __init__(self, msg: bytes, num_advice=8, num_lanes=8, tamper=False):
        self.msg = msg
        self.num_advice = num_advice
        self.num_lanes = num_lanes
        self.tamper = tamper
        self.digest_values = None

    def configure(self, cs):
        gcfg = FlexGateConfig.configure(cs, self.num_advice)
        scfg = Sha256Config.configure(cs, self.num_lanes)
        return gcfg, scfg

    def synthesize(self, config, asn):
        gcfg, scfg = config
        gate = GateChip(gcfg, asn)
        sha = Sha256Chip(scfg, gate, asn)
        msg_cells = [gate.load_witness(b) for b in self.msg]
        out = sha.digest(msg_cells, self.msg)
        self.digest_values = bytes(c.value for c in out)
        self.stats = sha.occupancy()
        if self.tamper:
            c = out[0]
            asn.advice[c.col.index][c.row] = (c.value + 1) % R


def test_padding():
    assert pad_message(b"abc") == (
        b"abc" + b"\x80" + b"\x00" * 52 + (24).to_bytes(8, "big"))
    assert len(pad_message(b"x" * 56)) == 128
    assert len(pad_message(b"")) == 64


def test_one_block_digest():
    msg = b"abc"
    h = ShaHarness(msg)
    mp = MockProver.run(13, h, [])
    assert h.digest_values == hashlib.sha256(msg).digest()
    fails = mp.verify()
    assert not fails, fails[:3]


def test_two_block_digest():
    msg = bytes(range(100))  # 100 bytes -> 2 blocks after padding
    h = ShaHarness(msg, num_advice=16, num_lanes=12)
    mp = MockProver.run(13, h, [])
    assert h.digest_values == hashlib.sha256(msg).digest()
    fails = mp.verify()
    assert not fails, fails[:3]


def test_tampered_digest_fails():
    h = ShaHarness(b"abc", tamper=True)
    mp = MockProver.run(13, h, [])
    assert mp.verify()


def test_occupancy_reported():
    h = ShaHarness(b"abc")
    MockProver.run(13, h, [])
    assert h.stats["sha_rows"] > 1000
