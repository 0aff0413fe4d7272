"""Composite step roofline: op-group floors vs measured device time.

Round-3 verdict Weak #3: the per-group certifications (histogram backward
bandwidth accounting, InstanceNorm stats micro-A/B, conv fusion cycle
estimates) never summed the flagship step into ONE table. This script
produces that table: it captures a device trace of the production train
chunk (reusing scripts/trace_ops.py's capture + xplane parsing), parses the
compiled program's optimized HLO to get every op's actual HBM traffic
(operand + result buffer bytes), buckets ops into op groups, and prints per
group:

  measured ms | HBM floor (bytes / 819 GB/s) | MXU floor (analytic FLOPs
  from utils/flops.py at 197 bf16-TFLOP/s) | VPU floor (elementwise
  lane-ops counted from the optimized HLO — fused computations summed
  into their fusions — at the calibrated 4.5 T lane-op/s) | ratio to
  max(floor)

plus the composite: step measured vs sum-of-group-floors, i.e. "the step is
X% above its composite max(HBM, MXU, VPU) floor". Groups far above all
three floors are the next optimization target.

v5e-1 peaks used: 819 GB/s HBM, 197 TFLOP/s bf16 MXU, 4.5 T VPU
lane-ops/s (calibrated by the round-3 histogram-backward per-fusion
certification, docs/DESIGN.md).

Usage:
    python scripts/roofline.py [--variant histogram] [--batch 1024]
    python scripts/roofline.py --aggregate-only   # reuse the last capture
"""

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

HBM_BW = 819e9  # v5e HBM bandwidth, bytes/s
MXU_PEAK = 197e12  # v5e bf16 FLOP/s

DTYPE_BYTES = {
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "s32": 4, "u32": 4, "s64": 8, "u64": 8,
    "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1, "s4": 1, "u4": 1,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dtype, 4)


def parse_hlo_bytes(hlo_path: str) -> dict:
    """name -> (result_bytes, operand_bytes) for every top-level HLO op.

    Result bytes come from the def line's own shape(s); operand bytes from
    the referenced defs' result shapes. Only ENTRY-computation defs matter
    (the traced ops are top-level instructions; fused computations execute
    inside their fusion and never touch HBM themselves)."""
    result_bytes = {}
    operands = {}
    def_re = re.compile(r"^\s+(?:ROOT )?%([\w.\-]+) = (.*)$")
    # "<shapes> <opcode>(<operand list>)": shapes (possibly a tuple, with
    # layout annotations that themselves contain parens like T(8,128)) up
    # to the first LOWERCASE opcode token followed by '('. The operand list
    # itself may ALSO carry layout-annotated shapes when the dump prints
    # operand types (e.g. "fusion(f32[8,4]{1,0:T(8,128)} %a, %b)"), so it
    # must be cut at the BALANCED closing paren, not the first ')'.
    # calls=%.../to_apply=%... come after the operand parens and must not
    # count as operands.
    head_re = re.compile(r"^(.*?) ([a-z][\w\-]*)\(")
    for line in open(hlo_path):
        m = def_re.match(line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        lm = head_re.match(rest)
        if lm:
            shapes_part = lm.group(1)
            depth, start = 1, lm.end()
            i = start
            while i < len(rest) and depth:
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                i += 1
            op_list = rest[start : i - 1]
        else:
            shapes_part, op_list = rest, ""
        result_bytes[name] = sum(
            _shape_bytes(t, d) for t, d in _SHAPE_RE.findall(shapes_part)
        )
        operands[name] = re.findall(r"%([\w.\-]+)", op_list)
    out = {}
    for name in result_bytes:
        out[name] = (
            result_bytes[name],
            sum(result_bytes.get(o, 0) for o in operands.get(name, ())),
        )
    return out


# v5e VPU peak, lane-ops/s: 8x128 lanes x 4 ALUs = 4096 lane-ops/cycle,
# at the ~1.5 GHz core clock the 197 bf16-TFLOP/s MXU peak implies
# (197e12 / (4 MXUs x 128x128 MACs x 2 flops) = 1.5e9) -> 6.1e12. A
# HARDWARE peak, deliberately above the ~4-5 T effective rate the round-3
# hist-bwd hand accounting used: floors must undercount. Measured
# validation: the nine certified hist-bwd fusions run at 84-88% of this
# peak (docs/DESIGN.md round-5 VPU column).
VPU_PEAK = 6.1e12

# Per-opcode VPU lane-op weights for the floor. Deliberately OPTIMISTIC
# (a floor must undercount, never overcount): every elementwise op is 1
# lane-op per RESULT element — including divides and transcendentals,
# which really run multi-pass; reductions are 1 per INPUT element; data
# movement (copy/reshape/broadcast/slice/gather/...) and MXU ops
# (dot/convolution) are 0 — their costs live in the HBM and MXU columns.
_VPU_ZERO = frozenset(
    "parameter constant bitcast bitcast-convert tuple get-tuple-element "
    "reshape transpose broadcast iota copy copy-start copy-done slice pad "
    "concatenate gather scatter dynamic-slice dynamic-update-slice "
    "dot convolution custom-call fusion while conditional call "
    "rng-bit-generator after-all infeed outfeed partition-id replica-id "
    "send recv get-dimension-size".split()
)
_VPU_REDUCE = frozenset(("reduce", "reduce-window", "select-and-scatter"))


def _elems(dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def parse_hlo_defs(hlo_path: str) -> dict:
    """name -> dict(opcode, elems, bytes, operands, calls, comp) for every
    instruction in the module (all computations — fused computations
    included, so fusion VPU work can be summed from their members)."""
    defs = {}
    members = collections.defaultdict(list)
    def_re = re.compile(r"^\s+(?:ROOT )?%([\w.\-]+) = (.*)$")
    head_re = re.compile(r"^(.*?) ([a-z][\w\-]*)\(")
    comp_re = re.compile(r"^(?:ENTRY )?%([\w.\-]+) \(")
    cur_comp = None
    for line in open(hlo_path):
        cm = comp_re.match(line)
        if cm:
            cur_comp = cm.group(1)
            continue
        m = def_re.match(line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        lm = head_re.match(rest)
        if lm:
            shapes_part, opcode = lm.group(1), lm.group(2)
            depth, start = 1, lm.end()
            i = start
            while i < len(rest) and depth:
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                i += 1
            op_list = rest[start : i - 1]
        else:
            shapes_part, opcode, op_list = rest, "", ""
        shapes = _SHAPE_RE.findall(shapes_part)
        callm = re.search(r"(?:calls|to_apply)=%([\w.\-]+)", rest)
        cyc = re.search(r'estimated_cycles\\?":\\?"(\d+)', rest)
        defs[name] = {
            "opcode": opcode,
            "elems": sum(_elems(d) for _, d in shapes),
            "dims": tuple(
                int(x) for x in shapes[0][1].split(",") if x
            ) if shapes else (),
            "bytes": sum(_shape_bytes(t, d) for t, d in shapes),
            "operands": re.findall(r"%([\w.\-]+)", op_list),
            "calls": callm.group(1) if callm else "",
            "comp": cur_comp,
            "cycles": int(cyc.group(1)) if cyc else 0,
            "raw": rest if opcode in ("convolution", "dot") else "",
        }
        members[cur_comp].append(name)
    return defs, members


def mxu_flops_of(
    name: str, defs: dict, members: dict, _depth: int = 0, useful: bool = False
) -> float:
    """Analytic MXU FLOPs of one instruction from the HLO itself
    (convolutions and dots, fusions summed over their members) — the
    per-op counterpart of utils/flops.py's per-model totals.

    useful=False counts MAC SLOTS the lowering occupies (input-dilated
    convT forms include the zero positions the systolic array grinds
    through if lowered naively); useful=True divides out the lhs_dilation
    product — the algorithmic minimum, matching utils/flops.py."""
    d = defs.get(name)
    if d is None or _depth > 2:
        return 0.0
    op = d["opcode"]
    if op == "fusion" and d["calls"]:
        return sum(
            mxu_flops_of(m, defs, members, _depth + 1, useful)
            for m in members.get(d["calls"], ())
        )
    if op == "convolution":
        m = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", d["raw"])
        kref = d["operands"][1] if len(d["operands"]) > 1 else None
        if not m or kref not in defs:
            return 0.0
        klabels = m.group(2)  # e.g. 01io: kernel spatial/in/out positions
        kdims = defs[kref]["dims"]
        if len(kdims) != len(klabels):
            return 0.0
        in_feat = kdims[klabels.index("i")]  # already per-feature-group
        spatial = 1
        for pos, lab in enumerate(klabels):
            if lab.isdigit():
                spatial *= kdims[pos]
        flops = 2.0 * d["elems"] * in_feat * spatial
        if useful:
            dil = re.search(r"lhs_dilate=([\dx]+)", d["raw"])
            if dil:
                for f in dil.group(1).split("x"):
                    flops /= max(int(f), 1)
        return flops
    if op == "dot":
        m = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", d["raw"])
        lref = d["operands"][0] if d["operands"] else None
        if not m or lref not in defs:
            return 0.0
        ldims = defs[lref]["dims"]
        contracted = 1
        for s in m.group(1).split(","):
            if s:
                contracted *= ldims[int(s)]
        return 2.0 * d["elems"] * contracted
    return 0.0


def cycles_of(name: str, defs: dict) -> int:
    d = defs.get(name)
    return d["cycles"] if d else 0


def vpu_ops_of(name: str, defs: dict, members: dict, _depth: int = 0) -> float:
    """Analytic VPU lane-op count of one instruction, fusions included
    (sums the called computation's members, recursing one level for
    nested fusions)."""
    d = defs.get(name)
    if d is None or _depth > 2:
        return 0.0
    op = d["opcode"]
    if op == "fusion" and d["calls"]:
        return sum(
            vpu_ops_of(m, defs, members, _depth + 1)
            for m in members.get(d["calls"], ())
        )
    if op in _VPU_ZERO:
        return 0.0
    if op in _VPU_REDUCE:
        # a reduce's operands are N arrays then N init scalars — every
        # array element passes through an ALU once (variadic stats
        # reduces like InstanceNorm's (sum, sum_sq) count both inputs)
        ops = d["operands"]
        arrays = ops[: len(ops) // 2] if len(ops) >= 2 else ops
        return float(sum(defs[o]["elems"] for o in arrays if o in defs))
    return float(d["elems"])


def load_trace(log_dir: str):
    """(per-op seconds, per-op op_name metadata, steps) from the capture."""
    import trace_ops as to_mod  # reuse the xplane machinery

    # replicate trace_ops.aggregate's parsing, returning instead of printing
    import glob
    import importlib

    meta_path = os.path.join(log_dir, "trace_ops_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    steps = meta["steps"]

    xplane_pb2 = None
    for mod in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
    ):
        try:
            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    by_name = collections.Counter()
    for path in glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True):
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            pmeta = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = pmeta[ev.metadata_id].name
                    if name.startswith(("%while", "jit_", "%jit")):
                        continue
                    by_name[name.lstrip("%").split(" ")[0]] += ev.duration_ps / 1e12

    # op_name metadata from the exact HLO (same logic as trace_ops)
    opname = {}
    hlo_path = os.path.join(log_dir, "trace_ops_hlo.txt")
    defs = {}
    comp_meta = collections.defaultdict(collections.Counter)
    cur = None
    with open(hlo_path) as f:
        for line in f:
            mhead = re.match(r"%([\w.\-]+) \(", line)
            if mhead:
                cur = mhead.group(1)
            mdef = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = ", line)
            name = mdef.group(1) if mdef else None
            om = re.search(r'op_name="([^"]+)"', line)
            cm = re.search(r"calls=%([\w.\-]+)", line)
            if name:
                defs[name] = (om.group(1) if om else "", cm.group(1) if cm else "")
            elif cur and om:
                comp_meta[cur][om.group(1)] += 1
    for key in by_name:
        om, call = defs.get(key, ("", ""))
        if not om and call and comp_meta.get(call):
            om = comp_meta[call].most_common(1)[0][0]
        opname[key] = om.replace("jit(train_chunk)/while/body/closed_call/", "")
    return by_name, opname, steps, meta


# Groups whose HBM-floor attribution is NOT claimable: async prefetch
# copies overlap compute (their bytes move on the DMA engines while the
# cores run other ops) and donation/layout aliases may move nothing at all
# — both measure far BELOW the naive buffer-bytes floor, so summing their
# "floors" into the composite would understate the step's true ratio.
# They contribute measured time only.
NO_FLOOR_GROUPS = ("copy/layout", "unattributed")


def group_of(key: str, o: str) -> str:
    """Bucket an op into its roofline group (patterns verified against the
    round-4 flagship HLO: histogram dots carry einsum-spec op_names
    bpi,bij->bpj / bpj,bij->bpi; the fused Pallas augmentation is the
    pallas_call custom call; conv fusions carry jvp(UnetGenerator)/... and
    their backwards the transpose(jvp(...)) prefix)."""
    n = key.lower()
    bwd = o.startswith("transpose(")
    if "bij->" in o or o.endswith("jvp()/dot_general"):
        # histogram einsum dots; the kOutput fusions around them include
        # the in-fusion kernel-matrix rebuilds (docs/DESIGN.md round-3
        # bandwidth accounting)
        return "hist-bwd" if bwd else "hist-fwd"
    if "pallas" in o or "pallas" in n:
        return "augment"
    if "yj,jkc,xk" in o or "hue" in o or "hsv" in o:
        return "augment"  # the XLA augmentation path, when selected
    if "PatchDiscriminator" in o:
        return "D-bwd" if bwd else "D-fwd"
    if "UnetGenerator" in o:
        return "G-bwd" if bwd else "G-fwd"
    if bwd:
        return "loss-bwd"
    if "copy" in n or "bitcast" in n:
        return "copy/layout"
    if "gather" in o or "gather" in n or "dynamic-slice" in n:
        return "batch-gather"
    if o:
        return "loss/optimizer"
    return "unattributed"


def mxu_group_floors(config, batch: int) -> dict:
    """Analytic MXU FLOPs per op group per STEP (utils/flops.py
    conventions), converted to seconds at the bf16 peak."""
    from palette_and_histo_gan_tpu.utils import flops as fl

    g_fwd = fl._generator_fwd_flops(config) * batch
    d_fwd = fl._discriminator_fwd_flops(config) * batch
    hist = fl._histogram_dot_flops(config) * batch
    groups = {
        "G-fwd": g_fwd,  # one G forward
        "G-bwd": 2.0 * g_fwd,  # input-grad + weight-grad conv passes
        "D-fwd": 3.0 * d_fwd,  # fake (G loss) + real + fake (D loss)
        # G-loss input-grad through D (1) + weight-grads for both D-loss
        # forwards (2); indexed drops the argmax-blocked input-grad
        "D-bwd": (2.0 if config.is_indexed else 3.0) * d_fwd,
    }
    if config.model == "histogram":
        # analytic MINIMUM dot planes (one (size,HW)@(HW,size) per channel
        # per histogram): fwd = 3 planes x 2 histograms; the tri backward
        # runs 9 cotangent dot planes of the same shape (docs/DESIGN.md)
        groups["hist-fwd"] = 2.0 * hist
        groups["hist-bwd"] = 3.0 * hist
    return {k: v / MXU_PEAK for k, v in groups.items()}


# Hand-counted VPU lane-ops per pixel-channel element of the fused Pallas
# augmentation (ops/augment_pallas.py::_augment_kernel_packed; the kernel
# is a custom call, so its interior is invisible to the HLO-derived count).
# Per uint8 channel element: unpack shift+and+convert (3), planar hue
# chain amortized over the pixel's 4 channels (vmax/mn 4, range+guarded
# reciprocal 4, hr/hg/hb 9, hue select 5, dh 2, piecewise dr/dg/db 12,
# recombine mn+rng*d 6 -> ~42/pixel ~= 10.5/element), translation masks
# (iota compares + bounds + select ~4), keep-select + normalize of both
# the augmented and original paths (~5), output convert (1) ~= 24 ops.
# Deliberately optimistic: int lane ops and multi-pass divides count 1.
AUGMENT_VPU_OPS_PER_ELEMENT = 24.0


def augment_vpu_ops(config, batch: int) -> float:
    """Analytic VPU lane-ops of the paired augmentation per STEP."""
    if not config.uses_augmentation:
        return 0.0
    per_image = config.img_size * config.img_size * config.input_channels
    return AUGMENT_VPU_OPS_PER_ELEMENT * 2.0 * per_image * batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="histogram")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--log-dir", default="/tmp/phg_roofline")
    p.add_argument("--aggregate-only", action="store_true")
    p.add_argument("--json-out", default="")
    p.add_argument(
        "--per-fusion",
        default="",
        help="print a per-op certification table for this group: measured "
        "vs HBM/VPU floors, HLO-derived MXU occupancy (MAC slots the "
        "lowering actually grinds through, zeros included), and XLA's own "
        "estimated_cycles at the 1.5 GHz clock",
    )
    args = p.parse_args()

    if not args.aggregate_only:
        import shutil

        import trace_ops as to_mod

        shutil.rmtree(args.log_dir, ignore_errors=True)
        to_mod.capture(
            args.variant, args.batch, args.dtype, args.steps, args.log_dir,
            donate=True,
        )

    by_name, opname, steps, meta = load_trace(args.log_dir)
    hlo_path = os.path.join(args.log_dir, "trace_ops_hlo.txt")
    hbm = parse_hlo_bytes(hlo_path)
    defs, comp_members = parse_hlo_defs(hlo_path)

    from palette_and_histo_gan_tpu.config import config_for_variant

    config = config_for_variant(
        meta["variant"], compute_dtype=meta["dtype"], batch_size=meta["batch"]
    )
    mxu = mxu_group_floors(config, meta["batch"])

    meas = collections.Counter()
    hbm_floor = collections.Counter()
    vpu_floor = collections.Counter()
    perop_floor = collections.Counter()
    for key, dur in by_name.items():
        grp = group_of(key, opname.get(key, ""))
        meas[grp] += dur / steps
        res_b, op_b = hbm.get(key, (0, 0))
        h_op = (res_b + op_b) / HBM_BW
        v_op = vpu_ops_of(key, defs, comp_members) / VPU_PEAK
        u_op = mxu_flops_of(key, defs, comp_members, useful=True) / MXU_PEAK
        hbm_floor[grp] += h_op
        vpu_floor[grp] += v_op
        # per-op composite: each op individually cannot beat ANY of its
        # unit floors (useful-MXU per op from the HLO conv/dot shapes) —
        # finer-grained than the group-level max, reported alongside it
        perop_floor[grp] += max(h_op, v_op, u_op)
    # the Pallas augmentation is a custom call — its interior VPU work is
    # invisible to the HLO-derived count, so use the kernel hand count
    if vpu_floor.get("augment", 0.0) * VPU_PEAK < 1e6 and "augment" in meas:
        vpu_floor["augment"] = augment_vpu_ops(config, meta["batch"]) / VPU_PEAK

    if args.per_fusion:
        tgt = args.per_fusion
        ops = sorted(
            (
                (dur / steps, key)
                for key, dur in by_name.items()
                if group_of(key, opname.get(key, "")) == tgt
            ),
            reverse=True,
        )
        print(
            f"{'op':28s} {'meas':>7s} {'HBM':>7s} {'MXUocc':>7s} {'MXUuse':>7s}"
            f" {'VPU':>7s} {'XLAest':>7s} {'ratio':>6s}  op_name"
        )
        tot = {"m": 0.0, "h": 0.0, "x": 0.0, "u": 0.0, "v": 0.0, "e": 0.0,
               "fl": 0.0}
        for dur, key in ops:
            res_b, op_b = hbm.get(key, (0, 0))
            h = (res_b + op_b) / HBM_BW * 1e3
            x = mxu_flops_of(key, defs, comp_members) / MXU_PEAK * 1e3
            u = mxu_flops_of(key, defs, comp_members, useful=True) / MXU_PEAK * 1e3
            v = vpu_ops_of(key, defs, comp_members) / VPU_PEAK * 1e3
            e = cycles_of(key, defs) / 1.5e9 * 1e3
            m = dur * 1e3
            fl = max(h, u, v)  # per-op composite: algorithmic triple floor
            tot["m"] += m; tot["h"] += h; tot["x"] += x; tot["u"] += u
            tot["v"] += v; tot["e"] += e; tot["fl"] += fl
            ratio = f"{m / fl:5.2f}x" if fl > 0 else "   - "
            print(
                f"{key[:28]:28s} {m:6.3f}m {h:6.3f}m {x:6.3f}m {u:6.3f}m"
                f" {v:6.3f}m {e:6.3f}m {ratio:>6s}  {opname.get(key, '')[:56]}"
            )
        print(
            f"{'TOTAL ' + tgt:28s} {tot['m']:6.3f}m {tot['h']:6.3f}m"
            f" {tot['x']:6.3f}m {tot['u']:6.3f}m {tot['v']:6.3f}m"
            f" {tot['e']:6.3f}m"
        )
        if tot["fl"] > 0:
            print(
                f"per-op composite floor sum(max(HBM,MXUuse,VPU)) ="
                f" {tot['fl']:.3f}m -> group is {tot['m']/tot['fl']:.2f}x"
                f" its per-op floor; XLA's own estimate prices it at"
                f" {tot['e']:.3f}m ({tot['m']/max(tot['e'],1e-9):.2f}x measured/est)"
            )
        return

    rows = []
    total_meas = total_floor = total_perop = 0.0
    for grp in sorted(meas, key=lambda g: -meas[g]):
        m = meas[grp] * 1e3
        no_floor = grp in NO_FLOOR_GROUPS
        hf = 0.0 if no_floor else hbm_floor[grp] * 1e3
        mf = mxu.get(grp, 0.0) * 1e3
        vf = 0.0 if no_floor else vpu_floor[grp] * 1e3
        pf = 0.0 if no_floor else max(perop_floor[grp] * 1e3, hf, mf, vf)
        floor = max(hf, mf, vf)
        bound = "n/a (overlapped/alias)"
        if not no_floor:
            bound = {hf: "hbm", mf: "mxu", vf: "vpu"}[floor]
        rows.append(
            {
                "group": grp,
                "measured_ms": round(m, 3),
                "hbm_floor_ms": round(hf, 3),
                "mxu_floor_ms": round(mf, 3),
                "vpu_floor_ms": round(vf, 3),
                "per_op_floor_ms": round(pf, 3),
                "bound": bound,
                "ratio": round(m / floor, 2) if floor > 0 else None,
                "per_op_ratio": round(m / pf, 2) if pf > 0 else None,
            }
        )
        total_meas += m
        total_floor += floor
        total_perop += pf

    print(
        f"{'group':14s} {'measured':>9s} {'HBM floor':>10s} {'MXU floor':>10s}"
        f" {'VPU floor':>10s} {'bound':>5s} {'ratio':>6s}"
    )
    for r in rows:
        ratio = f"{r['ratio']:.2f}x" if r["ratio"] else "  -  "
        bound = r["bound"].split(" ")[0]
        print(
            f"{r['group']:14s} {r['measured_ms']:8.3f}m {r['hbm_floor_ms']:9.3f}m"
            f" {r['mxu_floor_ms']:9.3f}m {r['vpu_floor_ms']:9.3f}m"
            f" {bound:>5s} {ratio:>6s}"
        )
    print(
        f"{'TOTAL':14s} {total_meas:8.3f}m {'':>21s} {total_floor:9.3f}m"
        f"  -> step is {total_meas/total_floor:.2f}x its composite "
        f"max(HBM,MXU,VPU) floor ({(total_meas/total_floor-1)*100:.0f}% above)"
    )
    print(
        f"per-op composite (sum over ops of max(HBM,MXUuseful,VPU)):"
        f" {total_perop:.3f}m -> {total_meas/total_perop:.2f}x"
    )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "variant": meta["variant"],
                    "batch": meta["batch"],
                    "dtype": meta["dtype"],
                    "rows": rows,
                    "total_measured_ms": round(total_meas, 2),
                    "total_floor_ms": round(total_floor, 2),
                    "ratio": round(total_meas / total_floor, 3),
                    "total_per_op_floor_ms": round(total_perop, 2),
                    "per_op_ratio": round(total_meas / total_perop, 3),
                },
                f,
                indent=1,
            )
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
