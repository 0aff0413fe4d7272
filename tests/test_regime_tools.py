"""Tests for the measured-baseline regime and roofline tooling.

scripts/ref_regime.py defines what BOTH frameworks of the measured
training-quality comparison must agree on; these tests pin its
determinism and semantics so a silent change can't desynchronize the two
sides' regimes. scripts/roofline.py's HLO buffer parser feeds the
composite floor table in docs/DESIGN.md; its parsing of tuple results and
layout annotations (which contain parens, the round-4 parser bug) is
pinned on a synthetic HLO snippet.
"""

import os
import sys

import numpy as np

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

import ref_regime  # noqa: E402

from tests import parity_utils as pu  # noqa: E402


class TestRefRegime:
    def test_batch_order_deterministic_and_complete(self):
        a = ref_regime.batch_order(250, 200)
        b = ref_regime.batch_order(250, 200)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (200, 4)
        assert a.min() >= 0 and a.max() < 250
        # drop-remainder epoch structure: the first 62 batches tile one
        # permutation of 0..249 without repeats
        first_epoch = a[:62].ravel()
        assert len(set(first_epoch.tolist())) == len(first_epoch)

    def test_reference_init_semantics(self):
        w = ref_regime.reference_init(pu.generator_param_spec(4, 4))
        # convs: the reference's N(0, 0.02) (networks.py:7), regenerated
        # from canonical names -> identical to pu.make_param
        np.testing.assert_array_equal(
            w["gen/down0/conv"], pu.make_param("gen/down0/conv", (4, 4, 4, 64), "conv")
        )
        # norm scales start at exactly one, offsets and biases at zero
        assert (w["gen/up0/norm/scale"] == 1.0).all()
        assert (w["gen/up0/norm/offset"] == 0.0).all()
        assert (w["gen/head/bias"] == 0.0).all()

    def test_window_means(self):
        vals = np.arange(10, dtype=np.float64)
        assert ref_regime.window_means(vals, 5) == [0.5, 2.5, 4.5, 6.5, 8.5]


class TestRooflineParser:
    def test_hlo_bytes_tuple_and_layout_parens(self, tmp_path):
        # layout annotations T(8,128) contain parens; tuple results list
        # several shapes before the opcode — both must parse (the round-4
        # bug collapsed a tuple at the first ')' inside T(1024))
        hlo = """
HloModule m

%fused (p0: f32[8,4]) -> f32[8,4] {
  %p0 = f32[8,4]{1,0:T(8,128)} parameter(0)
  ROOT %m = f32[8,4]{1,0:T(8,128)} multiply(%p0, %p0)
}

ENTRY %e (a: f32[8,4]) -> (f32[1024], f32[8,4]) {
  %a = f32[8,4]{1,0:T(8,128)} parameter(0)
  %big = f32[1024]{0:T(1024)} iota(), iota_dimension=0
  %fus = (f32[1024]{0:T(1024)}, f32[8,4]{1,0:T(8,128)}) fusion(%a, %big), kind=kOutput, calls=%fused
  ROOT %t = (f32[1024]{0:T(1024)}, f32[8,4]{1,0:T(8,128)}) tuple(%big, %a)
}
"""
        path = tmp_path / "hlo.txt"
        path.write_text(hlo)
        from roofline import parse_hlo_bytes

        b = parse_hlo_bytes(str(path))
        # fusion result: BOTH tuple elements (1024*4 + 8*4*4), operands =
        # %a (128 B) + %big (4096 B); calls=%fused must NOT count
        assert b["fus"] == (1024 * 4 + 8 * 4 * 4, 128 + 4096)
        assert b["a"][0] == 128
        assert b["big"][0] == 4096

    def test_hlo_bytes_operand_shapes_with_layout_parens(self, tmp_path):
        # some dump modes print operand TYPES inside the operand list, whose
        # layout annotations contain parens — the operand scan must cut at
        # the BALANCED ')' or it silently drops every operand after the
        # first annotation (undercounting HBM floors)
        hlo = """
HloModule m

ENTRY %e (a: f32[8,4]) -> f32[8,4] {
  %a = f32[8,4]{1,0:T(8,128)} parameter(0)
  %b = f32[8,4]{1,0:T(8,128)} parameter(1)
  ROOT %m = f32[8,4]{1,0:T(8,128)} multiply(f32[8,4]{1,0:T(8,128)} %a, f32[8,4]{1,0:T(8,128)} %b), metadata={op_name="mul"}
}
"""
        path = tmp_path / "hlo2.txt"
        path.write_text(hlo)
        from roofline import parse_hlo_bytes

        b = parse_hlo_bytes(str(path))
        # both operands must be counted (128 B each) despite T(8,128)
        # parens inside the operand list
        assert b["m"] == (128, 256)
