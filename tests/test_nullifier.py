"""In-circuit Poseidon + nullifier circuit: digests equal the native sponge,
constraints are satisfiable, forgeries rejected (realizes the reference's
nullifier.rs intent; native parity vs lib.rs:890-912 semantics in
test_poseidon.py).
"""
import pytest

from halo2tpu.circuits.nullifier import (
    NullifierCircuit,
    native_nullifier,
    pack_photo,
)
from halo2tpu.fields.bn254 import R
from halo2tpu.gadgets.flexgate import FlexGateConfig, GateChip
from halo2tpu.gadgets.poseidon import PoseidonChip, PoseidonConfig
from halo2tpu.ops.poseidon import hash_elements
from halo2tpu.plonk.circuit import Circuit, ConstraintSystem
from halo2tpu.plonk.mock import MockProver


class PoseidonHarness(Circuit):
    def __init__(self, inputs, tamper=False):
        self.inputs = inputs
        self.tamper = tamper
        self.got = None

    def configure(self, cs):
        gcfg = FlexGateConfig.configure(cs, 4)
        pcfg = PoseidonConfig.configure(cs)
        return gcfg, pcfg

    def synthesize(self, config, asn):
        gcfg, pcfg = config
        gate = GateChip(gcfg, asn)
        pos = PoseidonChip(pcfg, gate, asn)
        cells = [gate.load_witness(v) for v in self.inputs]
        out = pos.hash(cells)
        self.got = out.value
        if self.tamper:
            asn.advice[out.col.index][out.row] = (out.value + 1) % R


@pytest.mark.parametrize("n", [1, 4, 5, 9])
def test_poseidon_gadget_matches_native(n):
    inputs = [i * 31 + 7 for i in range(n)]
    h = PoseidonHarness(inputs)
    mp = MockProver.run(9, h, [])
    assert h.got == hash_elements(inputs)
    fails = mp.verify()
    assert not fails, fails[:3]


def test_poseidon_gadget_tamper_fails():
    h = PoseidonHarness([1, 2, 3], tamper=True)
    mp = MockProver.run(9, h, [])
    assert mp.verify()


def test_pack_photo():
    photo = bytes(range(64))
    packed = pack_photo(photo)
    assert len(packed) == 3
    assert packed[0] == int.from_bytes(photo[:31], "little")


def test_nullifier_circuit():
    photo = bytes((i * 7 + 3) % 256 for i in range(124))
    c = NullifierCircuit(12345678, photo)
    mp = MockProver.run(10, c, c.instances())
    fails = mp.verify()
    assert not fails, fails[:3]


def test_nullifier_wrong_instance_fails():
    photo = bytes(16)
    c = NullifierCircuit(1, photo)
    inst = c.instances()
    inst[0][1] = (inst[0][1] + 1) % R
    mp = MockProver.run(10, c, inst)
    assert mp.verify()
