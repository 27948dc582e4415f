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
from typing import Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent))
from conv_budget import hlo_convs, trace_durs  # noqa: E402

import os

PEAK_GBPS = float(os.environ.get("PEAK_GBPS", "819.0"))
# 819 = v5e spec. Practical streaming ceiling: the fastest pure-streaming
# fusions in the trace sustain ~690 GB/s (D add_add 2.98 GB @ 84% spec);
# PEAK_GBPS=690 rebases the histogram on that in-situ calibration
# (tpu_tests/hbm_peak.py measures it directly when a chip is attached).

DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^}]*)\})?")


def _physical_elems(dims, layout: str) -> int:
    """Element count of the TILED buffer in HBM: the minor-most (lane) and
    second-minor (sublane) dims — per the layout's minor-to-major perm —
    are padded up to the T(sublane,lane) tile. This padding is physically
    resident and physically transferred (HBM traffic moves whole tiles), so
    it is the denominator that makes roofline %peak honest for narrow-
    channel tensors (a bf16 [..,16]-minor tensor under T(16,128) moves 8x
    its logical bytes)."""
    if not dims:
        return 1
    n = 1
    for d in dims:
        n *= d
    if not layout or ":" not in layout:
        return n
    perm_s, rest = layout.split(":", 1)
    tile_m = re.match(r"T\(([\d,]+)\)", rest)
    if not tile_m:
        return n
    try:
        perm = [int(p) for p in perm_s.split(",")]
        tile = [int(t) for t in tile_m.group(1).split(",")]
    except ValueError:
        return n
    if len(perm) != len(dims):
        return n
    # pad the len(tile) minor-most logical dims up to the tile
    for i, t in enumerate(reversed(tile)):  # i=0 -> lane dim, i=1 -> sublane
        if i >= len(perm):
            break
        d = dims[perm[i]]
        padded = -(-d // t) * t
        n = n // d * padded
    return n


def shape_bytes(sig: str) -> Tuple[int, int]:
    """(logical, physical) bytes of one 'bf16[1,2,3]{layout}' or tuple
    '(bf16[..]{..}, f32[..]{..})' sig. Physical includes tile padding;
    buffers in a non-default memory space (layout 'S(1)' = VMEM-resident)
    move no HBM bytes and count zero physical."""
    logical = physical = 0
    for dt, dims_s, layout in SHAPE_RE.findall(sig):
        if dt not in DTYPE_BYTES:
            continue
        dims = [int(d) for d in dims_s.split(",") if d]
        n = 1
        for d in dims:
            n *= d
        logical += n * DTYPE_BYTES[dt]
        if "S(" not in (layout or ""):
            physical += _physical_elems(dims, layout) * DTYPE_BYTES[dt]
    return logical, physical


def leading_dim(sig: str) -> int:
    m = SHAPE_RE.search(sig)
    if m and m.group(2):
        return int(m.group(2).split(",")[0])
    return 1


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
    if opcode in ("copy", "copy-start", "copy-done"):
        return "copy"
    if meta.endswith("dot_general"):
        return "dot"
    if ("dynamic-update-slice" in name or "dynamic_update_slice" in opcode
            or "dynamic-slice" in name or opcode == "dynamic-slice"
            or meta.endswith(("dynamic_update_slice", "dynamic_slice"))):
        return "scan-dus"
    if opcode in ("pad", "slice", "concatenate", "reshape", "reverse",
                  "bitcast", "transpose"):
        return "movement"
    if ("reduce" in name or "reduce" in opcode
            or meta.endswith(("reduce_sum", "reduce_max", "reduce_min"))):
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
        byts, pbyts = shape_bytes(sig)
        if opcode in ("slice", "dynamic-slice", "copy-done") or meta.endswith(
                "dynamic_slice"):
            # reads only the region it writes (copy-done: the async copy's
            # read+write lands on the wait)
            byts, pbyts = 2 * byts, 2 * pbyts
        elif opcode == "copy-start":
            byts = pbyts = 0  # accounted on the matching copy-done
        elif opcode == "dynamic-update-slice" or meta.endswith(
                "dynamic_update_slice"):
            # in-place scan stacking: traffic is the updated slab (read the
            # update + write the slab), not the whole accumulator
            ld = max(1, leading_dim(sig))
            byts, pbyts = 2 * byts // ld, 2 * pbyts // ld
        else:
            has_index = any(
                defs.get(o) and defs[o][0].startswith("s32[]")
                for o in operands)
            for o in operands:
                od = defs.get(o)
                if od:
                    ob, op = shape_bytes(od[0])
                    # a fused dynamic-slice (s32 index operand) reads one
                    # slab of a scan-stacked operand, not the whole stack
                    ld = leading_dim(od[0])
                    if has_index and ld > 1 and ob > 32 << 20:
                        ob //= ld
                        op //= ld
                    byts += ob
                    pbyts += op
        execs = max(1, cnt[name])
        gbps = (byts * execs / 1e9) / (ms / 1e3) if ms > 0 else 0.0
        pgbps = (pbyts * execs / 1e9) / (ms / 1e3) if ms > 0 else 0.0
        rows.append((ms, name, execs, byts, pbyts, gbps, pgbps,
                     categorize(name, opcode, meta), side_of(meta),
                     "/".join(meta.split("/")[-3:])))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"non-conv device time accounted: {total:.1f} ms "
          f"(+{missing:.1f} ms unresolved)\n")

    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for ms, _, execs, byts, pbyts, _, _, cat, side, _ in rows:
        a = agg[(cat, side)]
        a[0] += ms
        a[1] += byts * execs / 1e9
        a[2] += pbyts * execs / 1e9
    print(f"{'category':12s} {'side':4s} {'ms':>8s} {'GB':>8s} "
          f"{'physGB':>8s} {'phys GB/s':>9s} {'%peak':>6s}")
    for (cat, side), (ms, gb, pgb) in sorted(agg.items(),
                                             key=lambda x: -x[1][0]):
        pgbps = pgb / (ms / 1e3) if ms else 0
        print(f"{cat:12s} {side:4s} {ms:8.1f} {gb:8.2f} {pgb:8.2f} "
              f"{pgbps:9.0f} {100*pgbps/PEAK_GBPS:5.1f}%")

    # speed-of-light histogram: how much of the non-conv time runs at what
    # fraction of the physical-HBM roofline
    buckets = [(1.3, "overcounted (>130%: accounting artifact)"),
               (0.8, "at SoL (80-130% phys peak)"),
               (0.5, "50-80%"), (0.25, "25-50%"), (0.0, "<25%")]
    hist = collections.defaultdict(float)
    for row in rows:
        frac = row[6] / PEAK_GBPS
        for lo, label in buckets:
            if frac >= lo:
                hist[label] += row[0]
                break
    print("\nspeed-of-light distribution (physical bytes):")
    for _, label in buckets:
        ms = hist.get(label, 0.0)
        print(f"  {label:40s} {ms:8.1f} ms  {100*ms/total:5.1f}%")

    print("\ntop non-conv ops:")
    print(f"{'ms':>8s} {'x':>5s} {'MB/ex':>7s} {'phMB':>7s} {'GB/s':>6s} "
          f"{'ph%pk':>5s} cat      side  name / where")
    for (ms, name, execs, byts, pbyts, gbps, pgbps, cat, side,
         where) in rows[:top]:
        print(f"{ms:8.2f} x{execs:4d} {byts/1e6:7.1f} {pbyts/1e6:7.1f} "
              f"{gbps:6.0f} {100*pgbps/PEAK_GBPS:4.0f}% {cat:8s} {side:4s}  "
              f"{name}  {where}")


if __name__ == "__main__":
    main()
