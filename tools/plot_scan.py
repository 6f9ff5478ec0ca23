#!/usr/bin/env python
"""Plot the JSON output of `python -m victor_tpu scan`.

1D scans: delta-chi2 curve with the 68/95% crossing lines.
2D scans: filled delta-chi2 contours at 2.30 / 6.18 (the 68.3/95.4% levels
for TWO jointly-estimated parameters) with the best fit marked.

Usage:
    python -m victor_tpu scan cfg.yaml --param fsigma8 --param epsilon > scan.json
    python tools/plot_scan.py scan.json [-o scan.png]
"""

import argparse
import json

import numpy as np


def plot_scan(result: dict, out_path: str):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    names = result['scan']
    grid = np.asarray(result['grid'], dtype=float)
    dchi2 = np.asarray(result['delta_chi2'], dtype=float)

    fig, ax = plt.subplots(figsize=(5.2, 4.2))
    if len(names) == 1:
        x = grid[:, 0]
        ax.plot(x, dchi2, marker='.')
        for level, label in [(1.0, '68.3%'), (4.0, '95.4%')]:
            ax.axhline(level, ls=':', lw=0.8, color='gray')
            ax.annotate(label, (x[0], level), fontsize=8,
                        va='bottom', color='gray')
        ax.set_xlabel(names[0])
        ax.set_ylabel(r'$\Delta\chi^2$')
        ax.set_ylim(0, min(dchi2.max() * 1.05, 25.0))
    elif len(names) == 2:
        # infer the (n1, n2) mesh from the flattened ij-ordered grid
        n2 = len(np.unique(grid[:, 1]))
        n1 = len(grid) // n2
        X = grid[:, 0].reshape(n1, n2)
        Y = grid[:, 1].reshape(n1, n2)
        Z = dchi2.reshape(n1, n2)
        # 68.3/95.4% for 2 jointly-estimated parameters
        cs = ax.contourf(X, Y, Z, levels=[0.0, 2.30, 6.18],
                         colors=['#4477aa', '#99bbdd'], alpha=0.8)
        ax.contour(X, Y, Z, levels=[2.30, 6.18], colors='k', linewidths=0.7)
        i0 = int(np.argmin(dchi2))
        ax.plot(grid[i0, 0], grid[i0, 1], 'k+', ms=10)
        ax.set_xlabel(names[0])
        ax.set_ylabel(names[1])
        fig.colorbar(cs, label=r'$\Delta\chi^2$')
    else:
        raise ValueError('only 1D and 2D scans can be plotted')
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('scan_json', help='output of `python -m victor_tpu scan`')
    ap.add_argument('-o', '--out', default=None,
                    help='output png (default: <scan_json>.png)')
    args = ap.parse_args()
    import os
    with open(args.scan_json) as f:
        result = json.load(f)
    out = args.out or os.path.splitext(args.scan_json)[0] + '.png'
    print(plot_scan(result, out))


if __name__ == '__main__':
    main()
