"""Unit tests for tools/opdecomp.py's optimized-HLO parser: TRUE
per-call HBM bytes (VMEM-pinned S(1) buffers count zero; operands
consumed through nested slices charge the slice size) and conv/dot
FLOPs (dim_labels-aware; lhs_dilation holes and lhs-extent tap caps —
XLA writes batched einsums as degenerate convolutions).

The real-workload cross-check is the gen1 window: parse totals agree
with the independently calibrated unrolled-lowering FLOP count
(tools/mfu.py) to ~2% (docs/artifacts/opdecomp_gen1_infer_r5.json).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from opdecomp import parse_hlo, shape_bytes  # noqa: E402


def test_shape_bytes_tuple_and_vmem():
    s = ("(f32[16,64,80]{0,2,1:T(8,128)S(1)}, "
         "bf16[16,64,80,64]{3,0,2,1:T(8,128)(2,1)})")
    assert shape_bytes(s) == 16 * 64 * 80 * 4 + 16 * 64 * 80 * 64 * 2
    # hbm_only drops the S(1) (VMEM-pinned) component
    assert shape_bytes(s, hbm_only=True) == 16 * 64 * 80 * 64 * 2


HLO = """
HloModule test

%fused_inner (p0: u8[21,16,32,320], p1: s32[]) -> bf16[16,32,320] {
  %p0 = u8[21,16,32,320]{3,2,1,0:T(8,128)(4,1)} parameter(0)
  %p1 = s32[]{:T(128)} parameter(1)
  %c0 = s32[]{:T(128)} constant(0)
  %ds = u8[1,16,32,320]{3,2,1,0:T(8,128)(4,1)} dynamic-slice(%p0, %p1, %c0, %c0, %c0), dynamic_slice_sizes={1,16,32,320}
  %cv = bf16[1,16,32,320]{3,2,1,0:T(8,128)(2,1)} convert(%ds)
  ROOT %bc = bf16[16,32,320]{2,1,0:T(8,128)(2,1)} bitcast(%cv)
}

%fused_outer (param_0: u8[21,16,32,320], param_1: s32[], param_2: bf16[2,2,320,64]) -> bf16[16,32,64] {
  %param_0 = u8[21,16,32,320]{3,2,1,0:T(8,128)(4,1)} parameter(0)
  %param_1 = s32[]{:T(128)} parameter(1)
  %inner = bf16[16,32,320]{2,1,0:T(8,128)(2,1)} fusion(%param_0, %param_1), kind=kLoop, calls=%fused_inner
  %param_2 = bf16[2,2,320,64]{3,2,1,0:T(8,128)(2,1)} parameter(2)
  ROOT %conv = bf16[16,32,64]{2,1,0:T(8,128)(2,1)} convolution(%inner, %param_2), window={size=2x2}, dim_labels=b01f_01io->b0f
}

ENTRY %main (a: u8[21,16,32,320], t: s32[], w: bf16[2,2,320,64], v: bf16[4,8]) -> bf16[16,32,64] {
  %a = u8[21,16,32,320]{3,2,1,0:T(8,128)(4,1)} parameter(0)
  %t = s32[]{:T(128)} parameter(1)
  %w = bf16[2,2,320,64]{3,2,1,0:T(8,128)(2,1)} parameter(2)
  %v = bf16[4,8]{1,0:T(8,128)(2,1)S(1)} parameter(3)
  %vcopy = bf16[4,8]{1,0:T(8,128)(2,1)S(1)} copy(%v)
  ROOT %big = bf16[16,32,64]{2,1,0:T(8,128)(2,1)} fusion(%a, %t, %w), kind=kOutput, calls=%fused_outer
}
"""


def test_fusion_slice_aware_bytes_through_nested_fusion():
    ops = parse_hlo(HLO)
    big = ops["big"]
    # the u8 window operand is consumed only via the dynamic-slice
    # inside the NESTED fusion: charge one timestep, not 21
    slice_bytes = 1 * 16 * 32 * 320
    w_bytes = 2 * 2 * 320 * 64 * 2
    assert big["in_bytes"] == slice_bytes + 4 + w_bytes
    assert big["out_bytes"] == 16 * 32 * 64 * 2


def test_fusion_flops_recurse_and_dim_labels():
    ops = parse_hlo(HLO)
    # conv inside the fused computation: kernel 01io -> non-'o' dims
    # 2*2*320; out 16*32*64 (b0f with window-reduced spatial)
    assert ops["big"]["flops"] == 2.0 * (16 * 32 * 64) * (2 * 2 * 320)


def test_vmem_pinned_copy_moves_no_hbm_bytes():
    ops = parse_hlo(HLO)
    assert ops["vcopy"]["in_bytes"] == 0
    assert ops["vcopy"]["out_bytes"] == 0


EINSUM_HLO = """
HloModule einsum

ENTRY %main (q: bf16[1024,16,2,32], k: bf16[1024,16,2,32], p: bf16[64,64,1], x: bf16[1024,80,64]) -> bf16[1024,2,16,16] {
  %q = bf16[1024,16,2,32]{3,2,1,0} parameter(0)
  %k = bf16[1024,16,2,32]{3,2,1,0} parameter(1)
  %p = bf16[64,64,1]{2,1,0} parameter(2)
  %x = bf16[1024,80,64]{2,1,0} parameter(3)
  %qk = bf16[1024,2,16,16]{3,2,1,0} convolution(%q, %k), window={size=1024x2 stride=1023x1 lhs_dilate=1024x2}, dim_labels=0b1f_0o1i->01bf
  ROOT %proj = bf16[1024,80,64]{0,2,1} convolution(%p, %x), window={size=80 pad=79_79 rhs_reversal=1}, dim_labels=fb0_o0i->f0b
}
"""


def test_einsum_conv_flops_lhs_dilation_holes():
    ops = parse_hlo(EINSUM_HLO)
    # q.kT as base-dilated conv: kernel spatial (1024,2) with
    # lhs_dilate (1024,2) -> ONE valid tap per dim; contraction = i=32
    assert ops["qk"]["flops"] == 2.0 * (1024 * 2 * 16 * 16) * 32


def test_einsum_conv_flops_lhs_extent_cap():
    ops = parse_hlo(EINSUM_HLO)
    # proj einsum: kernel spatial 80 but lhs spatial extent 1 -> a
    # single valid tap; contraction = i=64
    assert ops["proj"]["flops"] == 2.0 * (1024 * 80 * 64) * 64
