"""Model graph surgery (reference tools/update-onnx-model.py +
add-node-outputs-to-model.py analog), operating on any loadable format
(.onnx/.rten/.rtpu) and saving as .rten/.rtpu.

Usage:
  python tools/graph_tool.py model.onnx --list-ops
  python tools/graph_tool.py model.onnx --expose-output hidden_3 -o dbg.rtpu
  python tools/graph_tool.py model.onnx --rename-input x:input_ids -o out.rtpu
  python tools/graph_tool.py model.onnx --drop-output aux -o slim.rtpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rten_tpu.model import Model, ModelOptions


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("-o", "--output", help="write modified model here")
    ap.add_argument("--list-ops", action="store_true")
    ap.add_argument("--list-values", action="store_true")
    ap.add_argument("--expose-output", action="append", default=[],
                    metavar="NAME", help="add an intermediate value to the "
                    "graph outputs (debugging aid)")
    ap.add_argument("--drop-output", action="append", default=[], metavar="NAME")
    ap.add_argument("--rename-input", action="append", default=[],
                    metavar="OLD:NEW")
    ap.add_argument("--no-optimize", action="store_true")
    args = ap.parse_args(argv)

    m = Model.load_file(args.model, ModelOptions(optimize=not args.no_optimize))
    g = m.graph

    if args.list_ops:
        counts = {}
        for _, op in g.operators():
            counts[op.op_type] = counts.get(op.op_type, 0) + 1
        for name, c in sorted(counts.items()):
            print(f"{name}: {c}")
    if args.list_values:
        for nid, op in g.operators():
            for out in op.outputs:
                print(g.node_name(out))

    changed = False
    for name in args.expose_output:
        nid = g.find_node(name)
        if nid is None:
            raise SystemExit(f"no value named '{name}'")
        if nid not in g.output_ids:
            g.output_ids.append(nid)
            changed = True
    for name in args.drop_output:
        nid = g.find_node(name)
        if nid is None or nid not in g.output_ids:
            raise SystemExit(f"'{name}' is not a graph output")
        g.output_ids.remove(nid)
        changed = True
    for spec in args.rename_input:
        old, new = spec.split(":", 1)
        nid = g.find_node(old)
        if nid is None:
            raise SystemExit(f"no input named '{old}'")
        node = g.nodes[nid]
        del g._name_to_id[old]
        node.name = new
        g._name_to_id[new] = nid
        changed = True

    if args.output:
        m.save(args.output)
        print(f"wrote {args.output}" + (" (modified)" if changed else ""))
    elif changed:
        print("note: modifications made but no -o given; nothing written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
