#!/usr/bin/env python
"""HBM-roofline budget of the NON-conv time in the canonical train step.

Joins the step trace (profile_step.py) with the step HLO (attribute_ops.py):
for every timed device op whose fusion contains no convolution, computes the
HBM bytes it must move (sum of operand + output buffer sizes, resolved
through the HLO def-use graph) and the bandwidth it achieved, then
aggregates into categories. This is the tool behind BENCH_NOTES' non-conv
roofline table (VERDICT r1 item 1: prove which of the remaining non-conv
milliseconds are at HBM speed-of-light and which are attackable).

Inputs: /tmp/minipig_profile_step trace + /tmp/step_hlo.txt (run
profile_step.py step, then attribute_ops.py, first).

v5e HBM peak ~819 GB/s. Categories:
  copy         — layout/relayout copies (scan boundaries, conv-internal)
  scan-dus     — lax.scan dynamic-update/dynamic-slice stacking machinery
  bn-reduce    — BatchNorm statistics / loss reductions (reduce in fusion)
  elementwise  — BN apply / activation / optimizer pointwise fusions
  movement     — pad / slice / concatenate / reshape / reverse
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from conv_budget import hlo_convs, trace_durs  # noqa: E402

PEAK_GBPS = 819.0

DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(sig: str) -> int:
    """Bytes of one 'bf16[1,2,3]{...}' or tuple '(bf16[..], f32[..])' sig."""
    total = 0
    for dt, dims in SHAPE_RE.findall(sig):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


DEF_RE = re.compile(
    r"^\s*(?:ROOT )?%([\w.\-]+) = (\(?[\w\[\],\s{}:()\d]*?\)?\{?[^ ]*) "
    r"([\w\-]+)\(([^)]*)\)")
META_RE = re.compile(r'op_name="([^"]*)"')


def parse_defs(txt: str):
    """name -> (out_sig, opcode, [operand names], op_name metadata)."""
    defs = {}
    for line in txt.splitlines():
        m = DEF_RE.match(line)
        if not m:
            continue
        name, sig, opcode, args = m.groups()
        ops = re.findall(r"%([\w.\-]+)", args)
        meta = META_RE.search(line)
        # first definition wins (trace names refer to entry/while bodies;
        # collisions across computations are rare and shape-identical)
        if name not in defs:
            defs[name] = (sig, opcode, ops, meta.group(1) if meta else "")
    return defs


def categorize(name: str, opcode: str, meta: str) -> str:
    if opcode in ("copy", "copy-start"):
        return "copy"
    if "dynamic-update-slice" in name or "dynamic_update_slice" in opcode \
            or "dynamic-slice" in name or opcode == "dynamic-slice":
        return "scan-dus"
    if opcode in ("pad", "slice", "concatenate", "reshape", "reverse",
                  "bitcast", "transpose"):
        return "movement"
    if "reduce" in name or "reduce" in opcode:
        return "bn-reduce"
    return "elementwise"


def side_of(meta: str) -> str:
    if "CasNet" in meta or "UNet" in meta:
        return "G"
    if "Discriminator" in meta:
        return "D"
    if "adam" in meta or "opt" in meta.lower():
        return "opt"
    return "?"


def main(top: int = 35) -> None:
    durs, cnt = trace_durs()
    txt = Path("/tmp/step_hlo.txt").read_text()
    comps, f2c = hlo_convs(txt)
    defs = parse_defs(txt)

    rows = []
    missing = 0.0
    for name, ms in durs.items():
        comp = f2c.get(name)
        if (comp and comps.get(comp)) or name.startswith(("convolution", "conv")):
            continue  # conv side — covered by conv_budget.py
        if name.endswith(("-done",)):
            continue  # async completion markers, negligible
        d = defs.get(name)
        if d is None:
            missing += ms
            continue
        sig, opcode, operands, meta = d
        byts = shape_bytes(sig)
        for o in operands:
            od = defs.get(o)
            if od:
                byts += shape_bytes(od[0])
        execs = max(1, cnt[name])
        gbps = (byts * execs / 1e9) / (ms / 1e3) if ms > 0 else 0.0
        rows.append((ms, name, execs, byts, gbps,
                     categorize(name, opcode, meta), side_of(meta),
                     "/".join(meta.split("/")[-3:])))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"non-conv device time accounted: {total:.1f} ms "
          f"(+{missing:.1f} ms unresolved)\n")

    agg = collections.defaultdict(lambda: [0.0, 0.0])
    for ms, _, execs, byts, _, cat, side, _ in rows:
        a = agg[(cat, side)]
        a[0] += ms
        a[1] += byts * execs / 1e9
    print(f"{'category':12s} {'side':4s} {'ms':>8s} {'GB':>8s} "
          f"{'GB/s':>7s} {'%peak':>6s}")
    for (cat, side), (ms, gb) in sorted(agg.items(), key=lambda x: -x[1][0]):
        gbps = gb / (ms / 1e3) if ms else 0
        print(f"{cat:12s} {side:4s} {ms:8.1f} {gb:8.2f} {gbps:7.0f} "
              f"{100*gbps/PEAK_GBPS:5.1f}%")

    print("\ntop non-conv ops:")
    print(f"{'ms':>8s} {'x':>5s} {'MB/ex':>7s} {'GB/s':>6s} {'%pk':>5s} "
          f"cat      side  name / where")
    for ms, name, execs, byts, gbps, cat, side, where in rows[:top]:
        print(f"{ms:8.2f} x{execs:4d} {byts/1e6:7.1f} {gbps:6.0f} "
              f"{100*gbps/PEAK_GBPS:4.0f}% {cat:8s} {side:4s}  {name}  {where}")


if __name__ == "__main__":
    main()
