"""Derivator: rule-guided search over multi-stage expression programs.

The analog of the reference Derivator (include/nnet/derivator.h:42-154,
src/nnet/derivator.cc): BFS over derivation states with hash-based visited
pruning, a depth limit, and a goal predicate — every stage either matches a
library routine (Rule 6) or is pure data movement (a sum-free gather, which
lowers as a MemBound/DLT kernel). Candidates are optionally validated
numerically against the interpreter oracle (reference intermediate-state
equivalence checking via Interpreter).

On TPU the payoff profile differs from CUDA: XLA already fuses elementwise
chains, so the valuable derivations are *algorithm substitutions* — conv ->
im2col matmul (MXU-friendly), 1x1 conv -> matmul, band attention -> G2BMM —
plus the membound residue evaluator that turns any unmatched comprehension
into one fused XLA computation (evaluator.py doubles as the TVM-JIT analog).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from infinitensor_tpu.nnet import rules
from infinitensor_tpu.nnet.expr import Comprehension
from infinitensor_tpu.nnet.rules import Program, Stage, match_routine
from infinitensor_tpu.nnet.visitors import check_oob


@dataclasses.dataclass
class Candidate:
    program: Program
    depth: int
    n_routines: int
    n_membound_elems: int

    def score(self) -> tuple:
        """Lower is better: fewer unmatched elements, then fewer stages."""
        return (self.n_membound_elems, len(self.program.stages), self.depth)


class Derivator:
    """BFS with hash pruning (reference Derivator::search / guided mode)."""

    def __init__(self, max_depth: int = 4, max_states: int = 256,
                 verify: bool = True, rng_seed: int = 0):
        self.max_depth = max_depth
        self.max_states = max_states
        self.verify = verify
        self.rng = np.random.default_rng(rng_seed)
        self.n_states_visited = 0
        self.intermediate_states: list[Program] = []  # derivator.h:150 analog

    # -- moves --------------------------------------------------------------
    def _moves(self, prog: Program):
        for s in prog.stages:
            out = rules.rule8_guided_dlt(prog, s.name)
            if out is not None:
                yield ("rule8_guided_dlt", out)
            out = rules.rule90_merge_elementwise(prog, s.name)
            if out is not None:
                yield ("rule90_elementwise", out)
        for s in prog.stages[:-1]:
            out = rules.rule4_stage_merge(prog, s.name)
            if out is not None:
                yield ("rule4_stage_merge", out)
            out = rules.rule91_merge_stage_with_sum(prog, s.name)
            if out is not None:
                yield ("rule91_merge_sum", out)

    # -- goal ---------------------------------------------------------------
    @staticmethod
    def classify(prog: Program) -> Optional[Candidate]:
        """Annotate routines; None if some stage is neither a routine nor
        pure data movement."""
        n_routines = 0
        n_membound = 0
        for s in prog.stages:
            r = match_routine(s.comp)
            if r is not None:
                s.routine = r
                n_routines += 1
            elif not s.comp.sum_vars:
                size = 1
                for e in s.comp.shape:
                    size *= e
                n_membound += size
            else:
                return None
        return Candidate(prog, 0, n_routines, n_membound)

    # -- search -------------------------------------------------------------
    def derive(self, program: Program) -> list[Candidate]:
        frontier = [program]
        visited = {program.hash()}
        results: list[Candidate] = []
        for depth in range(self.max_depth):
            nxt: list[Program] = []
            for prog in frontier:
                for _, out in self._moves(prog):
                    h = out.hash()
                    if h in visited or len(visited) > self.max_states:
                        continue
                    visited.add(h)
                    self.n_states_visited += 1
                    self.intermediate_states.append(out)
                    cand = self.classify(out.clone())
                    if cand is not None:
                        cand.depth = depth + 1
                        if not self.verify or self._equivalent(program,
                                                               cand.program):
                            results.append(cand)
                    nxt.append(out)
            frontier = nxt
            if not frontier:
                break
        results.sort(key=Candidate.score)
        return results

    # -- oracle -------------------------------------------------------------
    def _equivalent(self, a: Program, b: Program) -> bool:
        from infinitensor_tpu.nnet.evaluator import evaluate_program
        for s in a.stages + b.stages:
            if check_oob(s.comp):
                return False
        feeds = {}
        for t in a.external_inputs():
            feeds[t.name] = self.rng.standard_normal(t.shape).astype(
                np.float32)
        for t in b.external_inputs():
            if t.name not in feeds:
                return False  # derivation invented an input — reject
        va = np.asarray(evaluate_program(a, feeds))
        vb = np.asarray(evaluate_program(b, feeds))
        return va.shape == vb.shape and np.allclose(va, vb, rtol=1e-4,
                                                    atol=1e-4)


def derive_op_program(comp: Comprehension, out_name: str = "out",
                      **kw) -> list[Candidate]:
    """Convenience: derive equivalents of a single-op comprehension."""
    return Derivator(**kw).derive(Program([Stage(out_name, comp)]))
