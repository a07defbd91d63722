"""Render the docs/figures gallery from the REFERENCE's own raw experiment
data through this framework's figure pipeline (L10 parity on real data,
no TPU needed):

1. the paper's 5151-point reward-landscape sweep (Exp_Raw_Data/total_reward.txt,
   the hyperplane-analysis artifact behind readme.md:3) -> the five ternary
   panels of Figure2.py:362-460, recombined with the reference's exact
   pair weights (Figure2.py:388-396);
2. the V_Max=5 hardware-protocol recording
   (body-center-2021-07-23-09-19-15.bin — the 4.97 m/s parity anchor) ->
   a Figure3-style body-velocity panel via analysis.rawdata.RobotBodyInfo;
3. the trot gait phase diagram (GaitColorBar parity).

Usage: python scripts/render_reference_figures.py [outdir=docs/figures]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")   # figures never need the TPU;
# must happen before any package import (module-level jnp constants would
# otherwise initialize the axon TPU backend — and hang if the tunnel is down)

import numpy as np

RAW = "/root/reference/Exp_Raw_Data"


def landscape_panels(outdir: str) -> None:
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import figures

    path = os.path.join(RAW, "total_reward.txt")
    if not os.path.exists(path):
        print("total_reward.txt not found; skipping landscape panels")
        return
    import csv

    with open(path) as f:
        rdr = csv.DictReader(f, delimiter=" ", skipinitialspace=True)
        rows = {k: [] for k in rdr.fieldnames if k}
        for row in rdr:
            for k in rows:
                rows[k].append(float(row[k]))
    col = {k: np.asarray(v) for k, v in rows.items()}

    w0, w1 = col["w0"], col["w1"]
    w2 = 1.0 - w0 - w1
    # the reference's ternary vertex order (Figure2.py:383-386): [w1, w2, w0]
    w = np.stack([w1, w2, w0], axis=1)
    # pair recombination exactly as Figure2.py:388-396
    r_v = 0.5 * col["cmd_linear"] + 0.5 * col["cmd_angular"]
    r_m = 0.25 * col["mimic_q"] + 0.75 * col["mimic_dq"]
    r_b = 0.5 * col["height_keep"] + 0.5 * col["balance_keep"]
    r_t = 0.5 * col["torque"] + 0.5 * col["torque_d"]
    ratio = np.array([0.3, 0.1, 0.3, 0.3])
    r_f = np.stack([r_v, r_m, r_b, r_t], axis=1) @ ratio
    comps = {"r_f": r_f, "r_v": r_v, "r_m": r_m, "r_b": r_b, "r_t": r_t}

    out = os.path.join(outdir, "reward_landscape_reference_data.png")
    figures.ternary_landscape_figure({"w": w}, comps, out)
    print(f"wrote {out} ({len(w)} sweep points)")


def velocity_panel(outdir: str) -> None:
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
        figures,
        rawdata,
    )

    stamp = "2021-07-23-09-19-15"
    bin_f = os.path.join(RAW, f"body-center-{stamp}.bin")
    par_f = os.path.join(RAW, f"Param-{stamp}.txt")
    if not (os.path.exists(bin_f) and os.path.exists(par_f)):
        print("V_Max=5 recording not found; skipping velocity panel")
        return
    rb = rawdata.RobotBodyInfo(bin_f, par_f)
    out = os.path.join(outdir, "vmax5_recording_velocity.png")
    figures.recorded_velocity_figure(
        rb.vel_body, dt=0.002, path=out, v_cmd=float(rb.cfg["V_Max"]),
        title=f"reference recording {stamp} (bp5_155, V_Max=5) — "
              "the 4.97 m/s parity anchor")
    print(f"wrote {out} ({rb.data.shape[0]} frames)")


def latency_panel(outdir: str) -> None:
    """Hardware-protocol speed-vs-latency (the C3 axis of Figure4.py:330-392)
    from the six recorded runs at delay 0..5 control steps (0..10 ms)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
        figures,
        rawdata,
    )

    stamps = ["2021-06-22-16-48-33", "2021-06-22-16-48-55",
              "2021-06-22-16-49-18", "2021-06-22-16-49-38",
              "2021-06-22-16-50-00", "2021-06-22-16-50-21"]
    rows = []
    for s in stamps:
        bin_f = os.path.join(RAW, f"body-center-{s}.bin")
        par_f = os.path.join(RAW, f"Param-{s}.txt")
        if not (os.path.exists(bin_f) and os.path.exists(par_f)):
            print(f"missing {s}; skipping latency panel")
            return
        rb = rawdata.RobotBodyInfo(bin_f, par_f)
        vx = rb.vel_formatted[0, :, 0, 0]
        rows.append({"latency_ms": 2.0 * float(rb.cfg["delay"]),
                     "v_mean": float(vx.mean()), "v_err": float(vx.std())})
    out = os.path.join(outdir, "speed_vs_latency_reference_data.png")
    figures.latency_figure(rows, out,
                           title="recorded bp5_155, V_Max=5 (Figure4 panel)")
    print(f"wrote {out}")


def poincare_panel(outdir: str) -> None:
    """First-return maps of v_x^B sampled once per gait period at 6/8/10 ms
    latency (Figure4 plot_poincare: limit-cycle degradation with delay)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
        figures,
        rawdata,
    )

    stamps = {"2021-07-22-16-07-01": "6 ms", "2021-07-22-16-07-19": "8 ms",
              "2021-07-22-16-07-38": "10 ms"}
    series = {}
    for s, label in stamps.items():
        bin_f = os.path.join(RAW, f"body-center-{s}.bin")
        par_f = os.path.join(RAW, f"Param-{s}.txt")
        if not (os.path.exists(bin_f) and os.path.exists(par_f)):
            print(f"missing {s}; skipping poincare panel")
            return
        rb = rawdata.RobotBodyInfo(bin_f, par_f)
        # one sample per 0.2 s gait period (100 control steps), offset mid-cycle
        sel = np.arange(50, rb.frames_per_episode // rb.skip,
                        100 // rb.skip)[:100]
        series[label] = rb.vel_formatted[0, sel, 0, 0]
    out = os.path.join(outdir, "poincare_latency_reference_data.png")
    figures.poincare_figure(series, out, xlabel="$v_{x,n}^B$",
                            ylabel="$v_{x,n+1}^B$")
    print(f"wrote {out}")


def gait_panel(outdir: str) -> None:
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import figures

    out = os.path.join(outdir, "gait_bar_trot.png")
    figures.gait_bar(config.test_default(), out)
    print(f"wrote {out}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "docs/figures"
    os.makedirs(outdir, exist_ok=True)
    landscape_panels(outdir)
    velocity_panel(outdir)
    latency_panel(outdir)
    poincare_panel(outdir)
    gait_panel(outdir)


if __name__ == "__main__":
    main()
