"""Dynamic-length SHA-256: one vk serves multiple message lengths.

Realizes the reference's `Sha256DynamicConfig` capability
(/root/reference/src/lib.rs:308-315): the vk depends only on max_len; the
actual message length is a witness, padding is verified in-circuit, and the
digest is one-hot selected from the per-block chained states
(halo2tpu/gadgets/sha256.py digest_dynamic).
"""
import hashlib

import pytest

from halo2tpu.gadgets.flexgate import FlexGateConfig, GateChip
from halo2tpu.gadgets.range import RangeChip, RangeStrategyConfig
from halo2tpu.gadgets.sha256 import (
    Sha256Chip, Sha256Config, dynamic_buffer_blocks, pad_dynamic,
)
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.keygen import keygen
from halo2tpu.plonk.mock import MockProver
from halo2tpu.plonk.prover import create_proof
from halo2tpu.plonk.srs import setup
from halo2tpu.plonk.verifier import verify_proof

MAX_LEN = 80  # -> 2-block dynamic buffer
K = 13


class DynamicShaCircuit(Circuit):
    """Digest of a variable-length message; instance = 32 digest bytes.

    `tamper` hooks let the negative tests break one padding invariant at a
    time while keeping the witness otherwise consistent.
    """

    def __init__(self, msg: bytes, tamper: str | None = None):
        self.msg = msg
        self.tamper = tamper

    def configure(self, cs: ConstraintSystem):
        gcfg = FlexGateConfig.configure(cs, 16)
        rcfg = RangeStrategyConfig.configure(cs, gcfg, 10, 4)
        scfg = Sha256Config.configure(cs, 16)
        inst = cs.instance_column()
        cs.enable_equality(inst)
        return {"gate": gcfg, "range": rcfg, "sha": scfg, "inst": inst}

    def synthesize(self, config, asn) -> None:
        gate = GateChip(config["gate"], asn)
        rng = RangeChip(config["range"], gate, asn)
        rng.load_table()
        sha = Sha256Chip(config["sha"], gate, asn)

        buf = bytearray(pad_dynamic(self.msg, MAX_LEN))
        mlen = len(self.msg)
        if self.tamper == "pad_marker":
            buf[mlen] = 0x81            # 0x80 -> 0x81
        elif self.tamper == "pad_zero":
            buf[mlen + 1] ^= 0x55       # nonzero in the zero region
        elif self.tamper == "length_field":
            buf[-1] ^= 0x08             # wrong bit length
        cells = []
        for b in buf:
            c = gate.load_witness(b)
            rng.range_check(c, 8)
            cells.append(c)
        mlen_cell = gate.load_witness(
            mlen + 1 if self.tamper == "mlen" else mlen)
        digest = sha.digest_dynamic(cells, mlen_cell, MAX_LEN)
        for i, byte in enumerate(digest):
            asn.copy((byte.col, byte.row), (config["inst"], i))
        rng.finalize()

    def instances(self):
        return [list(hashlib.sha256(self.msg).digest())]


MSG_SHORT = b"abc"
MSG_LONG = bytes(range(70))  # crosses into the second block


def test_dynamic_buffer_shape():
    assert dynamic_buffer_blocks(MAX_LEN) == 2
    assert pad_dynamic(b"abc", MAX_LEN)[3] == 0x80
    assert pad_dynamic(b"abc", MAX_LEN)[-72 // 8] == 0  # zero tail block pad


@pytest.mark.parametrize("msg", [MSG_SHORT, MSG_LONG, b""])
def test_dynamic_digest_mock(msg):
    mp = MockProver.run(K, DynamicShaCircuit(msg),
                        DynamicShaCircuit(msg).instances())
    assert not mp.verify()[:3]


@pytest.mark.parametrize("tamper", ["pad_marker", "pad_zero",
                                    "length_field", "mlen"])
def test_dynamic_digest_tamper_fails(tamper):
    c = DynamicShaCircuit(MSG_SHORT, tamper=tamper)
    good = DynamicShaCircuit(MSG_SHORT).instances()
    try:
        mp = MockProver.run(K, c, good)
    except AssertionError:
        return  # witness-gen assertion tripped: also a rejection
    assert mp.verify(), f"tamper {tamper} was not caught"


@pytest.mark.slow
def test_one_vk_two_lengths_real_proofs():
    """The VERDICT done-criterion: one keygen, two message lengths, both
    real proofs verify against the same vk."""
    srs = setup(K)
    c_short = DynamicShaCircuit(MSG_SHORT)
    c_long = DynamicShaCircuit(MSG_LONG)
    pk, vk = keygen(c_short, K, srs)
    p1 = create_proof(pk, srs, c_short, c_short.instances(), rng_seed=1)
    assert verify_proof(vk, srs, c_short.instances(), p1)
    p2 = create_proof(pk, srs, c_long, c_long.instances(), rng_seed=2)
    assert verify_proof(vk, srs, c_long.instances(), p2)
    # cross-check: short proof does not verify with long instances
    assert not verify_proof(vk, srs, c_long.instances(), p1)
