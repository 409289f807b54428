"""MockProver: constraint-satisfiability checker (no crypto).

Equivalent of halo2_proofs::dev::MockProver, the workhorse of every reference
test (/root/reference/src/lib.rs:445,581,950...).  Evaluates every gate on
every usable row against the witness matrix, checks copy constraints and
lookup membership.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..fields.bn254 import R
from .circuit import Assignment, Circuit, ConstraintSystem


@dataclass
class MockFailure:
    kind: str
    detail: str


class MockProver:
    def __init__(self, cs: ConstraintSystem, asn: Assignment,
                 instances: list[list[int]], n: int):
        self.cs = cs
        self.asn = asn
        self.n = n
        self.usable = cs.usable_rows(n)
        self.instance_values = []
        for ci in range(cs.num_instance):
            vals = [0] * n
            col = instances[ci] if ci < len(instances) else []
            for i, v in enumerate(col):
                vals[i] = v % R
            self.instance_values.append(vals)

    @classmethod
    def run(cls, k: int, circuit: Circuit, instances: list[list[int]]):
        cs = ConstraintSystem()
        config = circuit.configure(cs)
        n = 1 << k
        asn = Assignment(cs, n)
        circuit.synthesize(config, asn)
        return cls(cs, asn, instances, n)

    def _col_source(self, kind):
        if kind == "advice":
            return self.asn.advice
        if kind == "fixed":
            return self.asn.fixed
        return self.instance_values

    def verify(self) -> list[MockFailure]:
        failures: list[MockFailure] = []
        n, u = self.n, self.usable
        cs = self.cs

        def query_vals(q, kind):
            src = self._col_source(kind)[q.column_index]
            return [int(src[(i + q.rotation) % n]) % R for i in range(u)]

        # gates: native C++ row evaluator when available (the hot loop —
        # pure-python evaluation of wide circuits at k>=14 takes minutes)
        from .. import native
        if native.available():
            ev = native.NativeGateEvaluator(
                self.asn.fixed, self.asn.advice, self.instance_values, n, u)
            for gate in cs.gates:
                for gi, poly in enumerate(gate.polys):
                    for row in ev.eval_poly(poly):
                        failures.append(MockFailure(
                            "gate",
                            f"gate '{gate.name}' poly {gi} row {row}"))
                    if len(failures) > 16:
                        return failures
        else:
            for gate in cs.gates:
                for gi, poly in enumerate(gate.polys):
                    vals = poly.evaluate(
                        constant=lambda c: [c % R] * u,
                        fixed=lambda q: query_vals(q, "fixed"),
                        advice=lambda q: query_vals(q, "advice"),
                        instance=lambda q: query_vals(q, "instance"),
                        negate=lambda a: [(-x) % R for x in a],
                        add=lambda a, b: [(x + y) % R for x, y in zip(a, b)],
                        mul=lambda a, b: [x * y % R for x, y in zip(a, b)],
                    )
                    for row, v in enumerate(vals):
                        if v != 0:
                            failures.append(MockFailure(
                                "gate", f"gate '{gate.name}' poly {gi} row {row}: {v}"))
                            if len(failures) > 16:
                                return failures

        # copies
        for (ca, ra), (cb, rb) in self.asn.copies:
            va = int(self._col_source(ca.kind)[ca.index][ra]) % R
            vb = int(self._col_source(cb.kind)[cb.index][rb]) % R
            if va != vb:
                failures.append(MockFailure(
                    "copy", f"{ca}[{ra}]={va} != {cb}[{rb}]={vb}"))

        # lookups: satisfiability = per-row tuple membership in the table
        for lk in cs.lookups:
            inputs = list(zip(*[
                e.evaluate(
                    constant=lambda c: [c % R] * u,
                    fixed=lambda q: query_vals(q, "fixed"),
                    advice=lambda q: query_vals(q, "advice"),
                    instance=lambda q: query_vals(q, "instance"),
                    negate=lambda a: [(-x) % R for x in a],
                    add=lambda a, b: [(x + y) % R for x, y in zip(a, b)],
                    mul=lambda a, b: [x * y % R for x, y in zip(a, b)],
                ) for e, _ in lk.pairs]))
            table = set(zip(*[
                e.evaluate(
                    constant=lambda c: [c % R] * u,
                    fixed=lambda q: query_vals(q, "fixed"),
                    advice=lambda q: query_vals(q, "advice"),
                    instance=lambda q: query_vals(q, "instance"),
                    negate=lambda a: [(-x) % R for x in a],
                    add=lambda a, b: [(x + y) % R for x, y in zip(a, b)],
                    mul=lambda a, b: [x * y % R for x, y in zip(a, b)],
                ) for _, e in lk.pairs]))
            for row, tup in enumerate(inputs):
                if tup not in table:
                    failures.append(MockFailure(
                        "lookup", f"lookup '{lk.name}' row {row}: {tup} not in table"))
                    if len(failures) > 16:
                        return failures

        return failures

    def assert_satisfied(self) -> None:
        failures = self.verify()
        if failures:
            msgs = "\n".join(f"  [{f.kind}] {f.detail}" for f in failures)
            raise AssertionError(f"circuit not satisfied:\n{msgs}")
