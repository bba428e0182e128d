"""Summarize a jax.profiler trace: TPU time by HLO category and shape.

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/analyze_trace.py /tmp/videocad_trace [top_n] [--ops]

``--ops`` additionally prints the top individual HLO ops with their full
names (layouts included) — the view that found both round-2 wins.

Parses the xplane protobuf directly (no TensorBoard UI needed) and prints
the self-time breakdown that drove the round-1 kernel work (e.g. the ViT
attention transpose discovery). Requires the baked-in tensorflow package
for the xplane proto only.
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def analyze(trace_dir: str, top: int = 20, show_ops: bool = False):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    tpu_planes = [p for p in space.planes if "TPU" in p.name]
    for plane in tpu_planes:
        meta = plane.event_metadata
        smeta = plane.stat_metadata
        steps = [l for l in plane.lines if l.name == "Steps"]
        if steps and steps[0].events:
            total = sum(e.duration_ps for e in steps[0].events) / 1e12
            n = len(steps[0].events)
            print(f"{plane.name}: {n} steps, {total / n * 1e3:.1f} ms/step")

        ops = [l for l in plane.lines if l.name == "XLA Ops"]
        if not ops:
            continue
        cat_agg = collections.Counter()
        shape_agg = collections.Counter()
        op_agg = collections.Counter()
        for ev in ops[0].events:
            m = meta[ev.metadata_id]
            dur = ev.duration_ps / 1e12
            cat = None
            for st in list(ev.stats) + list(m.stats):
                if smeta[st.metadata_id].name == "hlo_category":
                    cat = st.str_value or st.ref_value
            cat_agg[cat] += dur
            name = m.name
            shape = (name.split("=", 1)[1].strip().split("{")[0][:48]
                     if "=" in name else name[:48])
            shape_agg[(cat, shape)] += dur
            op_agg[name[:120]] += dur

        print("\n-- self time by hlo_category (ms, whole trace) --")
        for cat, dur in cat_agg.most_common(top):
            print(f"{str(cat):32s} {dur * 1e3:9.1f}")
        print("\n-- top (category, output shape) --")
        for (cat, shape), dur in shape_agg.most_common(top):
            print(f"{str(cat)[:20]:20s} {shape:48s} {dur * 1e3:7.1f}")
        if show_ops:
            # Individual HLO ops (full op name incl. layouts) — this view
            # found both round-2 wins: the retiling copies around the
            # fused-MHSA kernel and the threefry xors inside the MLP
            # weight-gradient fusions.
            print("\n-- top individual ops --")
            for name, dur in op_agg.most_common(top):
                print(f"{dur * 1e3:8.2f}  {name}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--ops"]
    analyze(args[0] if args else "/tmp/videocad_trace",
            int(args[1]) if len(args) > 1 else 20,
            show_ops="--ops" in sys.argv)
