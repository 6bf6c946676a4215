"""Inspect an Orbax checkpoint directory: steps, tree summary, param counts.

    python tools/inspect_ckpt.py --ckpt output/<run>/ckpt
"""
import sys, os, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    args = p.parse_args()
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt))
    steps = mgr.all_steps()
    print(f"steps: {steps}")
    if not steps:
        return
    tree = mgr.restore(steps[-1])  # template-free raw restore

    import jax
    import numpy as np

    leaves = jax.tree.leaves_with_path(tree)
    total = 0
    groups = {}
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        total += arr.size
        ks = jax.tree_util.keystr(path)
        top = ks.split("'")[1] if "'" in ks else "?"
        groups[top] = groups.get(top, 0) + arr.size
    for k, v in sorted(groups.items()):
        print(f"  {k:14s} {v/1e6:9.2f}M params")
    print(f"  {'TOTAL':14s} {total/1e6:9.2f}M")
    mgr.close()


if __name__ == "__main__":
    main()
