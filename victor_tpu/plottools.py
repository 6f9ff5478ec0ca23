"""2D CCF plotting helpers (reference surface: victor/plottools.py:11,63).

Host-side matplotlib; re-implemented against the modern matplotlib API (the
reference's `plt.register_cmap` was removed upstream).
"""

from __future__ import annotations

import numpy as np

ryb_colors = np.array(['#3130ff', '#3366ff', '#9DAFFF', '#A6BDD7', '#F4C800',
                       '#FFB300', '#FF8E00', '#F13A13', '#C10020'])
ryg_colors = np.array(['#007D34', '#93AA00', '#F4C800', '#FFB300', '#FF8E00',
                       '#F13A13', '#C10020', '#7F180D'])


def shifted_color_map(cmap, start=0.0, midpoint=0.5, stop=1.0,
                      name='shiftedcmap'):
    """Colormap with its centre moved to `midpoint` — for data with asymmetric
    negative/positive range where zero should sit at the colour midpoint
    (victor/plottools.py:11-61). Typically midpoint = 1 - vmax/(vmax+|vmin|).
    """
    import matplotlib as mpl

    reg_index = np.linspace(start, stop, 257)
    shift_index = np.hstack([
        np.linspace(0.0, midpoint, 128, endpoint=False),
        np.linspace(midpoint, 1.0, 129, endpoint=True),
    ])
    cdict = {'red': [], 'green': [], 'blue': [], 'alpha': []}
    for ri, si in zip(reg_index, shift_index):
        r, g, b, a = cmap(ri)
        cdict['red'].append((si, r, r))
        cdict['green'].append((si, g, g))
        cdict['blue'].append((si, b, b))
        cdict['alpha'].append((si, a, a))
    new_cmap = mpl.colors.LinearSegmentedColormap(name, cdict)
    try:
        mpl.colormaps.register(new_cmap, name=name, force=True)
    except Exception:
        pass
    return new_cmap


def plot_2D_ccf(xi_sp, rs, rp=None, even=True, cmap=None, vmin=-1, vmax=0.2,
                contours=None, contour_colors='white', clabel=False,
                linewidths=1.2, shift=True, colorbar=True, axis_label='r',
                xlabel=None, ylabel=None, cbar_label=None):
    """Four-quadrant pcolormesh of a 2D ccf callable xi_sp(r_perp, r_par)
    (victor/plottools.py:63-109). `even=True` mirrors into the lower
    half-plane (valid for even-in-mu correlation functions)."""
    import matplotlib as mpl
    import matplotlib.pyplot as plt

    if cmap is None:
        cmap = mpl.cm.RdYlBu_r
    if shift:
        mid = 1 - vmax / (vmax + abs(vmin))
        cmap = shifted_color_map(cmap, midpoint=mid)
    plt.figure(figsize=(7.5, 6) if colorbar else (6.2, 6))
    if rp is None:
        rp = rs
        even = True
    grid = xi_sp(rs, rp)
    im = plt.pcolormesh(rs, rp, grid, vmin=vmin, vmax=vmax, cmap=cmap,
                        shading='gouraud')
    plt.pcolormesh(-rs, rp, grid, vmin=vmin, vmax=vmax, cmap=cmap,
                   shading='gouraud')
    if even:
        plt.pcolormesh(rs, -rp, grid, vmin=vmin, vmax=vmax, cmap=cmap,
                       shading='gouraud')
        plt.pcolormesh(-rs, -rp, grid, vmin=vmin, vmax=vmax, cmap=cmap,
                       shading='gouraud')
    plt.tick_params(labelsize=16)
    if colorbar:
        cb = plt.colorbar(im)
        if cbar_label:
            cb.set_label(cbar_label, fontsize=18)
    if contours:
        cs = plt.contour(rs, rp, grid, contours, colors=contour_colors,
                         linestyles='solid', linewidths=linewidths)
        plt.contour(-rs, rp, grid, contours, colors=contour_colors,
                    linestyles='solid', linewidths=linewidths)
        if even:
            plt.contour(rs, -rp, grid, contours, colors=contour_colors,
                        linestyles='solid', linewidths=linewidths)
            plt.contour(-rs, -rp, grid, contours, colors=contour_colors,
                        linestyles='solid', linewidths=linewidths)
        if clabel:
            plt.clabel(cs, inline=True, fontsize=10, fmt='%1.2f')
    if axis_label is not None:
        xlabel = r'$%s_\perp\;[h^{-1}\mathrm{Mpc}]$' % axis_label
        ylabel = r'$%s_{||}\;[h^{-1}\mathrm{Mpc}]$' % axis_label
    plt.xlabel(xlabel, fontsize=18)
    plt.ylabel(ylabel, fontsize=18)
    plt.yticks(ticks=plt.xticks()[0])
    plt.xlim(-np.max(rs), np.max(rs))
    plt.ylim(-np.max(rp), np.max(rp))
