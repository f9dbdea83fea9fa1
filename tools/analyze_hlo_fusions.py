#!/usr/bin/env python3
"""Analyze optimized-HLO text for relayout/copy pathologies in fusions.

The r3 vit_h trace showed the residual "add_add" fusions (fc2 conv fusions
with fused residual adds) running at ~100 GB/s effective — 8x slower per
byte than the same fusions at vit_b's width.  Suspected cause: fused
relayouts (copy/transpose with mismatched operand layouts) at
(8, 64, 64, 1280).  This script greps a compiled-HLO dump
(HLO_OUT=... tools/bench_sam_encoder.py) for:

* fusion instructions whose root or operands carry the target dims,
* copy / transpose / bitcast / reshape ops INSIDE those fusion bodies,
* layout annotations that differ across a fusion's operands/root.

Usage:
    python tools/analyze_hlo_fusions.py /tmp/vith_hlo.txt [dims]
dims default: 8,64,64,1280
"""

import collections
import re
import sys


def parse_computations(text):
    """Split HLO text into named computations -> list of body lines."""
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"^%?([\w\.\-]+)\s*\(.*\)\s*->\s*.*{\s*$", line)
        if m and not line.lstrip().startswith(("ROOT", "//")):
            cur = m.group(1)
            comps[cur] = []
            continue
        if cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comps[cur].append(line.strip())
    return comps


_SHAPE = re.compile(r"(\w+)\[([\d,]*)\](\{[\d,]+\})?")


def line_shapes(line):
    return [(dt, dims, (layout or "")) for dt, dims, layout
            in _SHAPE.findall(line)]


def main():
    path = sys.argv[1]
    dims = sys.argv[2] if len(sys.argv) > 2 else "8,64,64,1280"
    text = open(path).read()
    comps = parse_computations(text)

    # map fusion call-sites: which computation is called with kind=...
    callsite = {}
    for line in text.splitlines():
        m = re.search(r"fusion\(.*kind=(\w+).*calls=%?([\w\.\-]+)", line)
        if m:
            callsite[m.group(2)] = (m.group(1), line.strip())

    hits = []
    for name, body in comps.items():
        has_target = any(dims in ln for ln in body)
        if not has_target:
            continue
        ops = collections.Counter()
        relayout_lines = []
        layouts = collections.Counter()
        for ln in body:
            m = re.match(r"(?:ROOT\s+)?%?[\w\.\-]+\s*=\s*\S+\s+(\w+)", ln)
            op = m.group(1) if m else "?"
            ops[op] += 1
            for dt, d, lay in line_shapes(ln):
                if d == dims and lay:
                    layouts[lay] += 1
            if op in ("copy", "transpose", "bitcast", "reshape") \
                    and dims in ln:
                relayout_lines.append(ln[:200])
        kind, _ = callsite.get(name, ("?", ""))
        hits.append((name, kind, ops, layouts, relayout_lines))

    print(f"computations touching [{dims}]: {len(hits)}")
    n_with_relayout = 0
    for name, kind, ops, layouts, rl in hits:
        add_like = ops.get("add", 0)
        conv_like = ops.get("convolution", 0) + ops.get("dot", 0)
        flag = ""
        if rl:
            n_with_relayout += 1
            flag = "  <-- RELAYOUT IN BODY"
        if len(layouts) > 1:
            flag += f"  <-- MIXED LAYOUTS {dict(layouts)}"
        print(f"\n{name} kind={kind} adds={add_like} conv/dot={conv_like} "
              f"ops={dict(ops.most_common(6))}{flag}")
        for ln in rl[:4]:
            print(f"    {ln}")
    print(f"\nsummary: {n_with_relayout}/{len(hits)} computations with "
          f"copy/transpose/bitcast/reshape on [{dims}] in body")

    # whole-program relayout ops at the target dims (outside fusions too)
    print("\ntop-level copy/transpose at target dims:")
    for line in text.splitlines():
        if re.search(r"=\s*\S+\s+(copy|transpose)\(", line) and dims in line:
            print("  " + line.strip()[:220])


if __name__ == "__main__":
    main()
