"""Per-op device-time breakdown of a train computation via jax.profiler.

Captures a profiler trace of a few chunk steps, then parses the xplane
protobuf (TF ships the proto bindings) and aggregates device time by HLO
op category — the ground truth for where step time goes, when the tunneled
backend supports trace export.

Usage:
    python scripts/trace_ops.py [--variant histogram] [--batch 1024] [--top 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def capture(
    variant: str, batch: int, dtype: str, steps: int, log_dir: str,
    donate: bool = False,
    overrides: dict | None = None,
    compiler_options: dict | None = None,
):
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.train.state import build_models, create_train_state
    from palette_and_histo_gan_tpu.train.steps import make_train_chunk

    config = config_for_variant(
        variant, compute_dtype=dtype, batch_size=batch, donate_state=donate,
        **(overrides or {}),
    )
    models = build_models(config)
    state = create_train_state(config, models, jax.random.PRNGKey(0))
    n_data = max(1024, batch)
    rng = np.random.default_rng(0)
    if config.is_indexed:
        dataset = (
            jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 1)), jnp.int32),
            jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 1)), jnp.int32),
        )
    else:
        # uint8, like the production loader (data/loader.py::prepare_rgba) —
        # the chunk's 4-byte-lane packed gather only engages on uint8 splits
        dataset = (
            jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
            jnp.asarray(rng.integers(0, 256, (n_data, 64, 64, 4)), jnp.uint8),
        )
    chunk = make_train_chunk(config, models, n_data)
    key = jax.random.PRNGKey(1)
    # persist the optimized HLO of the exact traced program so the
    # aggregator can attribute each fusion to a model component via the
    # op_name metadata XLA carries (fusion indices change per compile, so
    # the text MUST come from this process, not a separate dump)
    compiled = chunk.lower(state, dataset, key, num_steps=steps).compile(
        compiler_options=compiler_options or None
    )
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "trace_ops_hlo.txt"), "w") as f:
        f.write(compiled.as_text())
    # sidecar so --aggregate-only scales by the steps this capture ran (not
    # whatever --steps the re-aggregating invocation happened to pass)
    with open(os.path.join(log_dir, "trace_ops_meta.json"), "w") as f:
        json.dump(
            {"steps": steps, "variant": variant, "batch": batch, "dtype": dtype},
            f,
        )
    # run the *compiled* executable (not the jit wrapper) so TPU
    # compiler_options A/Bs measure the program they configured
    state, mm = compiled(state, dataset, key)  # warmup
    float(mm["generator/total_loss"][-1])
    jax.profiler.start_trace(log_dir)
    state, mm = compiled(state, dataset, key)
    float(mm["generator/total_loss"][-1])
    jax.profiler.stop_trace()


def aggregate(log_dir: str, top: int, steps: int):
    import importlib

    # trust the capture's own step count when re-aggregating: the sidecar is
    # written next to the trace, so a later --aggregate-only with a
    # different --steps flag cannot mis-scale the per-step numbers
    meta_path = os.path.join(log_dir, "trace_ops_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("steps") != steps:
            print(
                f"[trace_ops] using steps={meta['steps']} from the capture "
                f"sidecar (flag said {steps})"
            )
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
    if xplane_pb2 is None:
        print("xplane proto bindings unavailable")
        return

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb produced — tunnel backend may not support tracing")
        return
    by_name = collections.Counter()
    full_line = {}
    total = 0.0
    tpu_planes = set()
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            tpu_planes.add(plane.name)
            meta = plane.event_metadata
            for line in plane.lines:
                # leaf compute ops only; 'Async XLA Ops' (prefetch copies)
                # overlap compute and 'XLA Modules'/'Steps' are umbrellas
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    if name.startswith(("%while", "jit_", "%jit")):
                        continue
                    dur = ev.duration_ps / 1e12
                    key = name.lstrip("%").split(" ")[0]
                    by_name[key] += dur
                    full_line[key] = name
                    total += dur
    if not by_name:
        print("no XLA op events found in trace")
        return
    if len(tpu_planes) > 1:
        # per-op durations are summed ACROSS the concurrent device planes,
        # so totals here are device-time (ndev x step wall time), not
        # step time — use utils.profiling.device_step_seconds (slowest
        # plane) for the step clock on a mesh
        print(
            f"note: {len(tpu_planes)} TPU planes in trace; per-op sums "
            "aggregate all devices (device-time, not step time)"
        )

    # map op -> source component via HLO op_name metadata from the exact
    # compiled program (written by capture()); fusions without their own
    # metadata inherit the dominant op_name of their fused computation body
    opname = {}
    # HLO lives next to the trace it belongs to (a global /tmp path could be
    # stale from a different capture); keep the old path as a fallback for
    # pre-sidecar captures
    hlo_path = os.path.join(log_dir, "trace_ops_hlo.txt")
    if not os.path.exists(hlo_path):
        hlo_path = "/tmp/trace_ops_hlo.txt"
    if os.path.exists(hlo_path):
        import re

        defs = {}
        comp_meta = collections.defaultdict(collections.Counter)
        cur = None
        with open(hlo_path) as f:
            for line in f:
                mhead = re.match(r"%([\w.\-]+) \(", line)
                if mhead:
                    cur = mhead.group(1)
                mdef = re.match(r"\s+%([\w.\-]+) = ", line)
                name = mdef.group(1) if mdef else None
                om = re.search(r'op_name="([^"]+)"', line)
                cm = re.search(r"calls=%([\w.\-]+)", line)
                if name:
                    defs[name] = (om.group(1) if om else "",
                                  cm.group(1) if cm else "")
                elif cur and om:
                    comp_meta[cur][om.group(1)] += 1
        for key in by_name:
            om, call = defs.get(key, ("", ""))
            if not om and call and comp_meta.get(call):
                om = comp_meta[call].most_common(1)[0][0]
            opname[key] = om.replace(
                "jit(train_chunk)/while/body/closed_call/", ""
            )

    def component(key):
        o = opname.get(key, "")
        n = key.lower()
        if "rgbuv" in o or "hellinger" in o or "logsumexp" in o:
            return "hist-loss"
        if "yj,jkc,xk" in o or "hue" in o or "hsv" in o:
            return "augment"
        if "PatchDiscriminator" in o:
            return "D-bwd+adam" if o.startswith("transpose(") else "D-fwd"
        if "UnetGenerator" in o:
            return "G-bwd+adam" if o.startswith("transpose(") else "G-fwd"
        if o.startswith("transpose("):
            return "loss-bwd"  # backward of loss-side dots/elementwise
        if "copy" in n or "bitcast" in n:
            return "copy/layout"
        if "gather" in o or "gather" in n:
            return "batch-gather"
        return "loss/other" if o else "unattributed"

    by_comp = collections.Counter()
    for key, dur in by_name.items():
        by_comp[component(key)] += dur
    print(json.dumps({"total_device_s": round(total, 4), "per_step_ms": round(total / steps * 1e3, 2)}))
    for comp, dur in by_comp.most_common():
        print(f"{comp:14s} {dur/steps*1e3:8.2f} ms/step  {dur/total*100:5.1f}%")
    print("--- top ops ---")
    for key, dur in by_name.most_common(top):
        om = opname.get(key, "")
        shapes = full_line.get(key, "")
        mshape = shapes.split(" = ", 1)[1][:60] if " = " in shapes else ""
        print(f"{dur/steps*1e3:8.3f} ms/step  {key[:38]:38s} {om[:70]:70s} {mshape}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="histogram")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--log-dir", default="/tmp/phg_trace")
    p.add_argument("--aggregate-only", action="store_true")
    p.add_argument(
        "--override", action="append", default=[], metavar="KEY=VALUE",
        help="Config override for device-clock A/Bs (literal-eval'd, "
        "string fallback), e.g. --override transpose_impl=subpixel",
    )
    p.add_argument(
        "--donate", action="store_true",
        help="donate the train state (the bench.py configuration); the "
        "device-side per_step_ms this script prints is the trustworthy "
        "throughput number — host-side marginal timing through the tunnel "
        "has shown +-25%% episodes (ab9 vs ab11 vs bench on one tree)",
    )
    p.add_argument(
        "--compiler-option", action="append", default=[], metavar="KEY=VALUE",
        help="XLA compiler option passed via lowered.compile(compiler_"
        "options=...) — the only way to reach TPU-only flags here (the "
        "local CPU XLA aborts on unknown names in XLA_FLAGS), e.g. "
        "--compiler-option xla_tpu_scoped_vmem_limit_kib=65536",
    )
    args = p.parse_args()
    if not args.aggregate_only:
        import shutil

        shutil.rmtree(args.log_dir, ignore_errors=True)
        import ast

        overrides = {}
        for item in args.override:
            key, _, value = item.partition("=")
            try:
                overrides[key] = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                overrides[key] = value
        copts = {}
        for item in args.compiler_option:
            key, _, value = item.partition("=")
            copts[key] = value
        capture(
            args.variant, args.batch, args.dtype, args.steps, args.log_dir,
            donate=args.donate, overrides=overrides, compiler_options=copts,
        )
    aggregate(args.log_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
