#!/usr/bin/env python
"""Join the step trace (profile_step.py) with the step HLO (attribute_ops.py)
into a conv-level time budget: which convolutions (fwd / dgrad / wgrad, by
shape) account for the step time, and which ops are pure data movement.

Inputs: /tmp/minipig_profile_step trace + /tmp/step_hlo.txt (run those first).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path


def trace_durs():
    path = sorted(glob.glob(
        "/tmp/minipig_profile_step/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            n = e.get("name", "")
            if n.startswith("jit_") or re.match(r"^(while|\d+)([.\d]*)$", n):
                continue
            durs[n] += e["dur"] / 1e3
            cnt[n] += 1
    return durs, cnt


CONV_RE = re.compile(
    r"%(?:conv[\w.\-]*|convolution[\w.\-]*) = (\w+)\[([\d,]+)\][^ ]* "
    r"convolution\(| convolution\(")


def hlo_convs(txt):
    """fusion/computation name -> list of (out_shape, window, dim_labels)."""
    comp = None
    out = collections.defaultdict(list)
    fusion_to_comp = {}
    for line in txt.splitlines():
        # greedy .* — computation headers may have tuple-typed params with
        # nested parens, e.g. "(p0: bf16[2], p1: (bf16[128], f32[1])) -> ";
        # the old [^)]* stopped at the first ")" and dropped such headers,
        # misattributing their convs to the previous computation (made the
        # fused dgrad+BN-backward kOutput fusions look like non-conv time).
        m = re.match(r"%?([\w.\-]+) \(.*\) -> ", line)
        if m:
            comp = m.group(1)
        # ".*?" for the shape sig — tuple-output fusions have spaces in it
        # ("(bf16[128]{...}, bf16[...]{...})"), which "\S+" never matched,
        # so tuple-rooted fusions (the dgrad+BN-backward kOutput fusions)
        # silently dropped out of the conv attribution.
        m = re.search(r"%([\w.\-]+) = .*? fusion\(.*?calls=%?([\w.\-]+)",
                      line)
        if m:
            fusion_to_comp[m.group(1)] = m.group(2)
        if "convolution(" in line:
            shape = re.search(r"= (\w+\[[\d,]*\])", line)
            win = re.search(r"window=\{([^}]*)\}", line)
            dl = re.search(r"dim_labels=(\S+?),", line)
            meta = re.search(r'op_name="([^"]*)"', line)
            out[comp].append((
                shape.group(1) if shape else "?",
                win.group(1) if win else "",
                dl.group(1) if dl else "",
                meta.group(1).split("/")[-2:] if meta else [],
            ))
    return out, fusion_to_comp


def classify(win, dl, opname):
    name = "/".join(opname)
    if "lhs_dilate" in win:
        kind = "dgrad(s2)" if "transpose" in name else "convT-fwd"
    elif re.match(r"[a-z0-9]*f[0-9]*b", dl.split("_")[0]):
        kind = "wgrad"
    elif "rhs_reversal" in win:
        kind = "dgrad(s1)"
    else:
        kind = "fwd"
    return kind


def main():
    durs, cnt = trace_durs()
    txt = Path("/tmp/step_hlo.txt").read_text()
    comps, f2c = hlo_convs(txt)
    # direct conv instrs at top level keep their own name
    rows = []
    other = 0.0
    for name, ms in durs.items():
        comp = f2c.get(name)
        convs = comps.get(comp, []) if comp else []
        if not convs and name.startswith(("convolution", "conv")):
            convs = [("?", "", "", [])]
        if convs:
            kinds = {classify(w, d, o) for (_, w, d, o) in convs}
            shapes = {s for (s, _, _, _) in convs}
            where = "G" if any("CasNet" in "/".join(o) for (_, _, _, o) in convs) \
                else ("D" if any("Discriminator" in "/".join(o)
                                 for (_, _, _, o) in convs) else "?")
            rows.append((ms, name, cnt[name], where,
                         "+".join(sorted(kinds)), list(shapes)[0]))
        else:
            other += ms
    rows.sort(reverse=True)
    total_conv = sum(r[0] for r in rows)
    print(f"conv-containing ops: {total_conv:.1f} ms   "
          f"non-conv ops: {other:.1f} ms")
    agg = collections.Counter()
    for ms, name, c, where, kind, shape in rows:
        agg[(where, kind)] += ms
    print("\nby (side, kind):")
    for (where, kind), ms in agg.most_common():
        print(f"  {where} {kind:12s} {ms:8.1f} ms")
    print("\ntop conv ops:")
    for ms, name, c, where, kind, shape in rows[:25]:
        print(f"{ms:8.2f} ms x{c:4d} {where} {kind:12s} {shape:34s} {name}")


if __name__ == "__main__":
    main()
