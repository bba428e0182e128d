"""Render the measured operating-envelope table into docs/PERF.md.

``python bench.py sweep`` writes docs/perf_sweep.json (one point per
bucket x batch x kernel mode, plus rollout points). This tool converts
that JSON into the markdown table between the AUTOGEN markers in
docs/PERF.md — the table is generated from measurements, never
hand-collected (VERDICT r2 next-round #5).

Usage: python tools/gen_perf_table.py [sweep.json] [PERF.md]
"""

import json
import os
import sys

BEGIN = "<!-- AUTOGEN:ENVELOPE begin (tools/gen_perf_table.py) -->"
END = "<!-- AUTOGEN:ENVELOPE end -->"


def render(points) -> str:
    trains = [p for p in points if p.get("kind") == "train"]
    rolls = [p for p in points if p.get("kind") == "rollout"]
    buckets = sorted({p["bucket"] for p in trains})
    combos = [(8, "fused"), (8, "block"), (16, "fused"), (16, "block")]

    def cell(bucket, batch, mode):
        for p in trains:
            if (p["bucket"], p["batch"], p["mode"]) == (bucket, batch, mode):
                if "frames_per_sec" in p:
                    return f"{p['frames_per_sec']:,.0f}"
                return p.get("error", "—")
        return "—"

    lines = [
        "Training throughput, frames/s/chip (synthetic resident batch, "
        "flagship model; `python bench.py sweep`):",
        "",
        "| bucket | B=8 fused | B=8 block | B=16 fused | B=16 block |",
        "|---|---|---|---|---|",
    ]
    for bucket in buckets:
        row = " | ".join(cell(bucket, b, m) for b, m in combos)
        lines.append(f"| {bucket} | {row} |")
    if rolls:
        lines += ["", "Rollout (KV-cached scan decode, 186-step horizon; "
                  "w8 = int8 decoder weight streaming, "
                  "`weight_quant='int8'`):", ""]
        lines += ["| batch | weights | actions/s |", "|---|---|---|"]
        for p in rolls:
            value = (f"{p['actions_per_sec']:,.0f}"
                     if "actions_per_sec" in p else p.get("error", "—"))
            lines.append(
                f"| {p['batch']} | {p.get('weights', 'bf16')} | {value} |")
    serves = [p for p in points if p.get("kind") == "serve"]
    if serves:
        lines += ["", "Serving engine steady state (lane-multiplexed "
                  "continuous batching, all lanes active; pipelined = "
                  "saturated-server throughput, sync = one client's "
                  "per-step latency; `python bench.py serve`):", ""]
        lines += ["| lanes | weights | actions/s | pipelined ms/step | "
                  "sync ms/step |", "|---|---|---|---|---|"]
        for p in serves:
            if "actions_per_sec" in p:
                lines.append(
                    f"| {p['lanes']} | {p.get('weights', 'bf16')} | "
                    f"{p['actions_per_sec']:,.0f} | "
                    f"{p['pipelined_step_ms']} | {p['sync_step_ms']} |")
            else:
                lines.append(f"| {p['lanes']} | {p.get('weights', 'bf16')} "
                             f"| {p.get('error', '—')} | — | — |")
    return "\n".join(lines)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sweep_path = argv[0] if argv else os.path.join(repo, "docs",
                                                   "perf_sweep.json")
    perf_path = argv[1] if len(argv) > 1 else os.path.join(repo, "docs",
                                                           "PERF.md")
    with open(sweep_path) as f:
        points = json.load(f)
    table = render(points)
    with open(perf_path) as f:
        doc = f.read()
    block = f"{BEGIN}\n{table}\n{END}"
    if BEGIN in doc:
        head, rest = doc.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        doc = head + block + tail
    else:
        doc = doc.rstrip() + "\n\n## Operating envelope (generated)\n\n" + \
            block + "\n"
    with open(perf_path, "w") as f:
        f.write(doc)
    print(f"wrote envelope table ({len(points)} points) into {perf_path}")


if __name__ == "__main__":
    main()
