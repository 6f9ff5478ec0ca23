"""Chain storage: checkpoints (npz pytree snapshots) + GetDist-format export.

The reference delegates chain files and resume entirely to cobaya, which
writes GetDist-format text chains under `output: chains/test`
(config/boss_cobaya_config.yaml:1). For ecosystem compatibility we write the
same format — `<root>.1.txt` rows of [weight, -lnpost, params..., derived...]
plus `<root>.paramnames` and `<root>.ranges` — so GetDist / existing victor
post-processing notebooks work unchanged. Sampler state (walker coords, PRNG
key, acceptance counters) is a flat pytree serialized to npz every
checkpoint interval; resume is exact (bit-identical continuation).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .ensemble import EnsembleState
from .priors import ParamSpace


def save_checkpoint(path: str, state: EnsembleState,
                    chain: Optional[np.ndarray] = None,
                    log_prob: Optional[np.ndarray] = None,
                    aux: Optional[np.ndarray] = None) -> None:
    """Serialize sampler state (+ optionally the recorded chain so far)."""
    payload = {
        'coords': np.asarray(state.coords),
        'log_prob': np.asarray(state.log_prob),
        'aux': np.asarray(state.aux),
        'key': np.asarray(state.key),
        'n_accepted': np.asarray(state.n_accepted),
        'n_steps': np.asarray(state.n_steps),
    }
    if chain is not None:
        payload['chain'] = np.asarray(chain)
        payload['chain_log_prob'] = np.asarray(log_prob)
        payload['chain_aux'] = np.asarray(aux)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + '.tmp.npz'
    # uncompressed: checkpoints rewrite the full history every segment, so
    # the per-save cost must stay at memcpy speed (compression would make
    # long runs quadratic in *compressor* time for a few MB saved)
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (EnsembleState, chain | None, log_prob | None, aux | None)."""
    import jax.numpy as jnp
    with np.load(path) as z:
        state = EnsembleState(
            coords=jnp.asarray(z['coords']), log_prob=jnp.asarray(z['log_prob']),
            aux=jnp.asarray(z['aux']), key=jnp.asarray(z['key']),
            n_accepted=jnp.asarray(z['n_accepted']),
            n_steps=jnp.asarray(z['n_steps']))
        chain = z['chain'] if 'chain' in z else None
        lnp = z['chain_log_prob'] if 'chain_log_prob' in z else None
        aux = z['chain_aux'] if 'chain_aux' in z else None
    return state, chain, lnp, aux


def export_getdist(root: str, space: ParamSpace, chain: np.ndarray,
                   log_prob: np.ndarray, aux: Optional[np.ndarray] = None,
                   aux_names: Optional[List[str]] = None,
                   burn_in: int = 0, chain_index: int = 1,
                   n_chain_files: Optional[int] = None,
                   weights: Optional[np.ndarray] = None) -> str:
    """Write GetDist-compatible text chains.

    chain: (n_steps, n_walkers, ndim); log_prob: (n_steps, n_walkers);
    aux: optional (n_steps, n_walkers, n_aux) derived columns (e.g. chi2);
    weights: optional (n_steps, n_walkers) row weights (default 1 — MCMC
    draws and the equal-weight SMC/NS particle exports; importance
    reweighting in sampling/post.py writes fractional weights).

    `n_chain_files`: split the walker axis into that many contiguous groups
    and write one `<root>.<i>.txt` per group — cobaya/MPI's file layout
    (`chains/test.<N>.txt` per chain, reference config/boss_cobaya_config.
    yaml:1), so GetDist's loadMCSamples sees N chains and can compute
    cross-chain R-hat, and existing victor post-processing works unchanged.
    Default (None): one combined file numbered `chain_index`.
    """
    chain = np.asarray(chain)[burn_in:]
    log_prob = np.asarray(log_prob)[burn_in:]
    n_steps, n_walkers, ndim = chain.shape
    wts = np.ones((n_steps, n_walkers)) if weights is None else \
        np.broadcast_to(np.asarray(weights, dtype=np.float64)[burn_in:],
                        (n_steps, n_walkers))

    def _columns(flat, lnp, aux_flat, w_flat):
        # derived columns: cobaya-style value-lambdas first, then aux outputs
        derived_cols, derived_names, derived_latex = [], [], []
        # one full_params evaluation covers every derived lambda (inside the
        # loop it recomputed all D lambdas D times per chain file)
        params = space.full_params(flat) if space.derived else None
        for d in space.derived:
            derived_cols.append(np.asarray(params[d.name]))
            derived_names.append(d.name)
            derived_latex.append(d.latex or d.name)
        if aux_flat is not None:
            for j, name in enumerate(aux_names or
                                     [f'aux_{j}' for j in range(aux_flat.shape[1])]):
                derived_cols.append(aux_flat[:, j])
                derived_names.append(name)
                derived_latex.append(name.replace('_', r'\_'))
        cols = [w_flat, -lnp] + \
            [flat[:, i] for i in range(ndim)] + derived_cols
        return np.column_stack(cols), derived_names, derived_latex

    aux3 = None if aux is None else \
        np.asarray(aux)[burn_in:].reshape(n_steps, n_walkers, -1)
    os.makedirs(os.path.dirname(os.path.abspath(root)), exist_ok=True)

    if n_chain_files and n_chain_files > 1:
        k = min(n_chain_files, n_walkers)
        groups = np.array_split(np.arange(n_walkers), k)
        chain_file = f'{root}.1.txt'
        for gi, idx in enumerate(groups, start=1):
            flat = chain[:, idx].reshape(-1, ndim)
            lnp = log_prob[:, idx].reshape(-1)
            aux_flat = None if aux3 is None else \
                aux3[:, idx].reshape(flat.shape[0], -1)
            table, derived_names, derived_latex = _columns(
                flat, lnp, aux_flat, wts[:, idx].reshape(-1))
            np.savetxt(f'{root}.{gi}.txt', table, fmt='%.8e')
    else:
        flat = chain.reshape(-1, ndim)
        lnp = log_prob.reshape(-1)
        aux_flat = None if aux3 is None else aux3.reshape(flat.shape[0], -1)
        table, derived_names, derived_latex = _columns(flat, lnp, aux_flat,
                                                       wts.reshape(-1))
        chain_file = f'{root}.{chain_index}.txt'
        np.savetxt(chain_file, table, fmt='%.8e')

    with open(f'{root}.paramnames', 'w') as f:
        for p in space.sampled:
            f.write(f'{p.name}\t{p.latex or p.name}\n')
        for name, latex in zip(derived_names, derived_latex):
            f.write(f'{name}*\t{latex}\n')

    lo, hi = space.bounds()
    with open(f'{root}.ranges', 'w') as f:
        for i, p in enumerate(space.sampled):
            lo_s = f'{lo[i]:.6g}' if np.isfinite(lo[i]) else 'N'
            hi_s = f'{hi[i]:.6g}' if np.isfinite(hi[i]) else 'N'
            f.write(f'{p.name}\t{lo_s}\t{hi_s}\n')

    # cobaya-compatible `<root>.covmat`: weighted posterior covariance of
    # the sampled parameters. cobaya-run writes this next to its chains and
    # reads it back via `mcmc: {covmat: ...}` to seed the next run's
    # proposal; ours round-trips the same way (read_covmat -> the samplers'
    # chol0 seed), so existing covmat files keep working after migration.
    flat_all = chain.reshape(-1, ndim)
    w_all = wts.reshape(-1)
    wsum = float(np.sum(w_all))
    if len(flat_all) >= 2 and wsum > 0:
        mu = np.average(flat_all, axis=0, weights=w_all)
        d = flat_all - mu
        # reliability-weights unbiased denominator (== N-1 at unit weights)
        denom = wsum - float(np.sum(w_all ** 2)) / wsum
        if denom > 0:
            cov = (d * w_all[:, None]).T @ d / denom
            write_covmat(f'{root}.covmat',
                         [p.name for p in space.sampled], cov)
    return chain_file


def append_progress(root: str, n: int, acceptance: float, rminus1: float,
                    reset: bool = False) -> str:
    """Append one row to `<root>.progress` — cobaya's convergence-monitoring
    file (columns `N timestamp acceptance_rate Rminus1 Rminus1_cl`, one row
    per checkpoint), so migrating users keep their tail/plot-progress
    workflows. `Rminus1_cl` (cobaya's bound on the confidence-limit drift)
    has no analogue here and is written as nan; R-1 itself is nan until
    enough post-warmup draws exist to define split-R-hat. `reset=True`
    truncates the file (a fresh run); resumed runs append."""
    import datetime
    path = root + '.progress'
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    fresh = reset or not os.path.isfile(path)
    with open(path, 'w' if fresh else 'a') as f:
        if fresh:
            f.write('# N  timestamp  acceptance_rate  Rminus1  Rminus1_cl\n')
        ts = datetime.datetime.now().strftime('%Y-%m-%d %H:%M:%S')
        f.write(f'{int(n)}  {ts}  {acceptance:.4f}  {rminus1:.6f}  nan\n')
    return path


def read_progress(root: str) -> Dict[str, np.ndarray]:
    """Parse `<root>.progress` (append_progress / cobaya format) into
    arrays: {'n', 'acceptance', 'rminus1'}. Rows whose R-1 column is 'nan'
    (too few draws for split-R-hat) parse as np.nan.

    Columns are anchored from the row's END (`... acceptance Rminus1
    Rminus1_cl`) because the timestamp width differs by convention:
    append_progress writes `date time` (two tokens) while cobaya writes a
    single ISO token — fixed-index parsing read cobaya rows off by one."""
    path = root if root.endswith('.progress') else root + '.progress'
    ns, accs, rm1s = [], [], []
    with open(path) as f:
        for ln in f:
            if ln.lstrip().startswith('#') or not ln.strip():
                continue
            parts = ln.split()
            # N <timestamp: 1 or 2 tokens> acceptance Rminus1 Rminus1_cl
            ns.append(int(parts[0]))
            accs.append(float(parts[-3]))
            rm1s.append(float(parts[-2]))
    return {'n': np.asarray(ns), 'acceptance': np.asarray(accs),
            'rminus1': np.asarray(rm1s)}


def write_covmat(path: str, names: List[str], cov: np.ndarray) -> None:
    """Write a cobaya-format covmat file: `# name1 name2 ...` header, then
    the matrix. Readable by cobaya's `mcmc: {covmat: ...}`, read_covmat,
    and the samplers' `covmat=` seed."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, 'w') as f:
        f.write('# ' + ' '.join(names) + '\n')
        np.savetxt(f, np.atleast_2d(np.asarray(cov)), fmt='%.8e')


def read_covmat(path: str, names: List[str],
                fallback_var: Optional[np.ndarray] = None) -> np.ndarray:
    """Load a cobaya-format `.covmat` (header line `# name1 name2 ...`,
    then the matrix) and reorder/subset it to `names`.

    cobaya semantics: parameters present in the file get their covariance
    block; parameters absent fall back to a diagonal entry (`fallback_var`,
    e.g. proposal widths squared — cobaya fills from `proposal:` the same
    way), with zero cross-covariance to the loaded block. Raises InputError
    when NO requested parameter is present (a wrong file, not a partial
    one) or the matrix is malformed."""
    from ..errors import InputError
    with open(path) as f:
        header = f.readline()
    if not header.lstrip().startswith('#'):
        raise InputError(
            f"covmat file {path!r} has no '# name1 name2 ...' header line")
    file_names = header.lstrip('#').split()
    mat = np.atleast_2d(np.loadtxt(path, skiprows=1))
    if mat.shape != (len(file_names), len(file_names)):
        raise InputError(
            f"covmat file {path!r}: matrix shape {mat.shape} does not match "
            f"its {len(file_names)}-name header")
    idx = {n: i for i, n in enumerate(file_names)}
    found = [n for n in names if n in idx]
    if not found:
        raise InputError(
            f"covmat file {path!r} (params {file_names}) shares no "
            f"parameter with the sampled block {list(names)}")
    n = len(names)
    out = np.zeros((n, n))
    if fallback_var is not None:
        out[np.diag_indices(n)] = np.asarray(fallback_var, dtype=float)
    for a, na in enumerate(names):
        for b, nb in enumerate(names):
            if na in idx and nb in idx:
                out[a, b] = mat[idx[na], idx[nb]]
    return out


def save_hmc_checkpoint(path: str, states, chain=None, log_prob=None,
                        aux=None, i0: Optional[int] = None) -> None:
    """Serialize vmapped HMCState chains (+ optionally recorded samples).

    `i0` is the global step index reached (segmented runs, runner.py);
    resume continues the scan exactly from there."""
    payload = {f'hmc_{k}': np.asarray(v) for k, v in states._asdict().items()}
    if i0 is not None:
        payload['i0'] = np.asarray(i0)
    if chain is not None:
        payload['chain'] = np.asarray(chain)
        payload['chain_log_prob'] = np.asarray(log_prob)
        payload['chain_aux'] = np.asarray(aux)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + '.tmp.npz'
    np.savez(tmp, **payload)   # uncompressed — see save_checkpoint
    os.replace(tmp, path)


def load_hmc_checkpoint(path: str):
    """Returns (HMCState, chain | None, log_prob | None, aux | None,
    i0 | None); i0 is the global step index for exact segmented resume."""
    import jax.numpy as jnp

    from .hmc import HMCState
    with np.load(path) as z:
        fields = {k[4:]: jnp.asarray(z[k]) for k in z.files
                  if k.startswith('hmc_')}
        state = HMCState(**fields)
        chain = z['chain'] if 'chain' in z else None
        lnp = z['chain_log_prob'] if 'chain_log_prob' in z else None
        aux = z['chain_aux'] if 'chain_aux' in z else None
        i0 = int(z['i0']) if 'i0' in z else None
    return state, chain, lnp, aux, i0


def read_getdist(root: str):
    """Read GetDist-format chains written by export_getdist (or cobaya).

    Returns (names, weights, minus_lnpost, samples) with every `<root>.N.txt`
    concatenated in chain-index order: `names` lists every column after the
    two leading ones (sampled params first, then derived/aux — derived names
    had their GetDist `*` suffix stripped), `samples` is (n, len(names)).

    This is the input side of sampling/post.py's importance reweighting; the
    reference ecosystem's equivalent consumers are GetDist itself and
    `cobaya post`.
    """
    import glob
    import re

    names = []
    with open(f'{root}.paramnames') as f:
        for line in f:
            token = line.split()[0] if line.split() else ''
            if token:
                names.append(token.rstrip('*'))
    # glob.escape: a root containing [, ], ? or * (e.g. 'chains/run[2026]/ns')
    # must match literally — the returned paths still carry the literal root
    # prefix, so the index slicing below stays valid
    files = [fn for fn in glob.glob(f'{glob.escape(root)}.*.txt')
             if re.fullmatch(r'\d+', fn[len(root) + 1:-4])]
    if not files:
        raise FileNotFoundError(f'no chain files match {root}.<N>.txt')
    files.sort(key=lambda fn: int(fn[len(root) + 1:-4]))
    data = np.vstack([np.loadtxt(fn, ndmin=2) for fn in files])
    if data.shape[1] != 2 + len(names):
        raise ValueError(
            f'{root}: chain files have {data.shape[1]} columns but '
            f'.paramnames lists {len(names)} parameters (expected '
            f'{2 + len(names)} columns: weight, -lnpost, params...)')
    return names, data[:, 0], data[:, 1], data[:, 2:]
