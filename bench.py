#!/usr/bin/env python
"""Headline benchmark: D3Q19 BGK lid-driven cavity, 256^3, fp32, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured MLUPS / 1500 (the TPU-v5e per-chip target from
BASELINE.json; the reference's best published single-GPU D3Q19 figure is
509.3 MLUPS on a Tesla C2050, perftest/results -- see BASELINE.md).
"""

import json
import sys
import time

TARGET = 1500.0


def main():
    import jax

    from sailfish_tpu import util
    util.enable_compile_cache()
    from examples.ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    n = 256
    warmup = 20
    # 1000 iters = 1.68e10 node-updates ~= 4 s of kernel per repeat:
    # the fixed ~60 ms dispatch/materialize cost of a measurement
    # through the remote-device tunnel drops to ~1.5% of the sample
    # (headline_protocol.md fit t0 ~= 60 ms; at the round-2 chunk of
    # 3.4e9 it biased the headline ~7% low)
    iters = 1000

    ctrl = LBSimulationController(LDCSim, default_config={
        'lat_nx': n, 'lat_ny': n, 'lat_nz': n,
        'max_iters': 0, 'quiet': True})
    defaults = {}
    LDCSim.update_defaults(defaults)
    defaults.update(ctrl._default_config)
    config = ctrl.config_parser.parse([], internal_defaults=defaults)
    LDCSim.modify_config(config)
    sim = LDCSim(config)

    from sailfish_tpu import geo as geo_mod
    from sailfish_tpu.runner import SubdomainRunner
    runner = SubdomainRunner(sim, geo_mod.LBGeometry3D(config))
    runner._init_geometry()
    runner._init_fields()
    runner._init_state()

    sync = util.materialize

    f = runner._run_steps(runner.f, warmup)
    sync(f)
    # three repeats of the identical chunk: the tunnel drifts ~10%
    # run-to-run, so the headline is the median and the spread is
    # reported alongside (benchmark/results/headline_protocol.md)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        f = runner._run_steps(f, iters)
        sync(f)
        samples.append(n ** 3 * iters / (time.perf_counter() - t0)
                       / 1e6)
    samples.sort()
    mlups = samples[1]
    print(json.dumps({
        'metric': 'MLUPS/chip D3Q19 LDC 256^3 fp32',
        'value': round(mlups, 1),
        'unit': 'MLUPS',
        'vs_baseline': round(mlups / TARGET, 4),
        'spread': [round(s, 1) for s in samples],
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
