"""Round-5 probe driver: run every pending TPU probe in ONE process.

One device acquisition, no timeout wrappers, nothing killed — killed
TPU-holding processes wedge the next acquisition on this tunneled stack
for ~10+ min, and a wedge inside a killed acquirer compounds.

Order: fa_sb (the decode-gap grid-restructure sweep), kv_update_sl (the
RMW batching sweep), fused_mlp (the single-stream bound probe).
"""

import os
import sys
import traceback

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _run(name, fn):
    print(f"=== {name} ===", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"=== {name} FAILED (continuing) ===", flush=True)


def main():
    import fa_sb_probe
    _run("fa_sb_probe", fa_sb_probe.main)
    import kv_update_sl_probe
    _run("kv_update_sl_probe", kv_update_sl_probe.main)
    import fused_mlp_matvec_probe
    _run("fused_mlp_matvec_probe", fused_mlp_matvec_probe.main)
    print("=== ALL PROBES DONE ===", flush=True)


if __name__ == "__main__":
    main()
