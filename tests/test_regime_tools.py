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

    def test_vpu_and_mxu_op_counting(self, tmp_path):
        # VPU: elementwise = result elems, reduce = input elems, data
        # movement and MXU ops = 0; fusions sum their called computation.
        # MXU: conv FLOPs = 2 * out_elems * kernel_in * kernel_spatial,
        # dot FLOPs = 2 * out_elems * contracted.
        hlo = """
HloModule m

%fc (p0: f32[8,64]) -> f32[8] {
  %p0 = f32[8,64] parameter(0)
  %e = f32[8,64] exponential(%p0)
  %c = f32[] constant(0)
  ROOT %r = f32[8] reduce(%e, %c), dimensions={1}, to_apply=%add
}

ENTRY %e (a: f32[8,64]) -> f32[8] {
  %a = f32[8,64] parameter(0)
  %k = bf16[4,4,8,16] parameter(1)
  %x = bf16[2,32,32,8] parameter(2)
  %cv = bf16[2,16,16,16] convolution(%x, %k), window={size=4x4 stride=2x2}, dim_labels=b01f_01io->b01f
  %lhs = f32[8,64] parameter(3)
  %rhs = f32[64,32] parameter(4)
  %d = f32[8,32] dot(%lhs, %rhs), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  ROOT %f = f32[8] fusion(%a), kind=kLoop, calls=%fc
}
"""
        path = tmp_path / "hlo3.txt"
        path.write_text(hlo)
        from roofline import mxu_flops_of, parse_hlo_defs, vpu_ops_of

        defs, members = parse_hlo_defs(str(path))
        # fusion %f sums %fc: exp (8*64) + reduce over its input (8*64)
        assert vpu_ops_of("f", defs, members) == 8 * 64 * 2
        # conv: 2 * (2*16*16*16) * in_feat 8 * spatial 16
        assert mxu_flops_of("cv", defs, members) == 2 * (2 * 16 * 16 * 16) * 8 * 16
        # dot: 2 * (8*32) * 64
        assert mxu_flops_of("d", defs, members) == 2 * 8 * 32 * 64
        # elementwise ops are zero MXU; convs/dots are zero VPU
        assert mxu_flops_of("f", defs, members) == 0
        assert vpu_ops_of("cv", defs, members) == 0
