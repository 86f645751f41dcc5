'''Kalman filtering/smoothing/EM (pykalman replacement).

Parity target: m2de/proc/kalman.py. The reference composes constant-jerk
(order-3) trackers via block-diagonal transition/observation matrices and
wraps pykalman for EM init (10 iters), chunked smoothing with carried state,
and streaming filter updates. EM uses Shumway–Stoffer updates for the same
em_vars (transition_covariance, observation_covariance,
initial_state_covariance).

The numerical core runs on host in float64 numpy: the state is at most
~54-dimensional, so per-chunk cost is microseconds, while float32 (the only
practical TPU precision) is not enough for EM on a near-degenerate
constant-jerk state covariance. The heavy image work stays on device; only
these tiny recurrences live on host.

Deviations (documented):
- ``sample`` returns the deterministic mean prediction A^n @ state instead of
  pykalman's stochastic draw (the reference uses sample() as a 1-step
  predictor; the mean is the intended estimate).
- Missing data: a timestep with any non-finite observation component is
  treated as fully missing (pykalman's masked-row behavior).
- EM covariances are eigenvalue-clipped to stay PSD.
'''
from abc import ABC, abstractmethod
from typing import NamedTuple, Optional, Sequence

import numpy as np
import scipy.linalg


def timestamps_to_steps(timestamps, step_size=(1 / 30 * 1000)):
    '''Discrete time steps between observations (m2de/proc/kalman.py:10-20).'''
    return np.rint(np.diff(timestamps) / step_size).astype(int)


def expand_missing_entries(data, time_steps):
    '''Insert masked rows where observations are missing
    (m2de/proc/kalman.py:23-58).'''
    out_shape = (int(np.sum(time_steps)) + 1, *data.shape[1:])
    full = np.zeros(out_shape, dtype=data.dtype)
    mask = np.zeros(out_shape, dtype=int)
    i = 0
    j = 0
    for j, k in enumerate(time_steps):
        full[i] = data[j]
        if k > 1:
            mask[i + 1:i + k] = 1
        i += k
    full[i] = data[j + 1]
    return np.ma.masked_array(full, mask=mask)


def reduce_missing_entries(data, time_steps):
    '''Remove rows at missing timesteps (inverse of
    :func:`expand_missing_entries`; m2de/proc/kalman.py:61-90).'''
    reduced = np.zeros((time_steps.shape[0] + 1, *data.shape[1:]), dtype=data.dtype)
    i = 0
    j = 0
    for j, k in enumerate(time_steps):
        reduced[j] = data[i]
        i += k
    reduced[j + 1] = data[i]
    return reduced


def angle_difference(angles1, angles2):
    '''Smallest signed angle difference in degrees (m2de/proc/kalman.py:93-98).'''
    from moseq2_detectron_extract_tpu.proc.angles import angle_difference as _ad
    return np.asarray(_ad(angles1, angles2))


class KalmanParams(NamedTuple):
    '''Linear-Gaussian state-space parameters (float64 numpy).'''
    transition: np.ndarray        # (S, S)
    observation: np.ndarray       # (O, S)
    transition_cov: np.ndarray    # (S, S)
    observation_cov: np.ndarray   # (O, O)
    initial_mean: np.ndarray      # (S,)
    initial_cov: np.ndarray       # (S, S)


def _symmetrize(m):
    return 0.5 * (m + m.T)


def _clip_psd(m, eps: float = 1e-9):
    '''Project a symmetric matrix onto the PSD cone (eigenvalue clipping).'''
    vals, vecs = np.linalg.eigh(_symmetrize(m))
    vals = np.maximum(vals, eps)
    return _symmetrize((vecs * vals) @ vecs.T)


def kalman_filter_step(params: KalmanParams, mean, cov, obs, missing):
    '''One predict+update step. ``missing`` True skips the measurement update.

    Returns (filtered_mean, filtered_cov, predicted_mean, predicted_cov).
    '''
    A, C = params.transition, params.observation
    pred_mean = A @ mean
    pred_cov = _symmetrize(A @ cov @ A.T + params.transition_cov)

    if missing:
        return pred_mean, pred_cov, pred_mean, pred_cov

    innov = obs - C @ pred_mean
    S = C @ pred_cov @ C.T + params.observation_cov
    K = np.linalg.solve(S, C @ pred_cov).T  # P C' S^{-1}
    new_mean = pred_mean + K @ innov
    new_cov = _symmetrize(pred_cov - K @ C @ pred_cov)
    return new_mean, new_cov, pred_mean, pred_cov


def _native_lib():
    from moseq2_detectron_extract_tpu.native import load_kalman_lib
    return load_kalman_lib()


def _as_c(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kalman_filter(params: KalmanParams, observations, missing,
                  use_native: bool = True):
    '''Forward filter over (T, O) observations with per-timestep missing flags.

    The first timestep updates the prior (initial_mean/cov) directly like
    pykalman (no transition before t=0). Returns dict of filtered/predicted
    means and covariances. Uses the C++ core (native/kalman_native.cpp) when
    available — the recurrence is tiny-matrix sequential work that numpy
    dispatch overhead dominates.
    '''
    observations = np.asarray(observations, dtype=np.float64)
    missing = np.asarray(missing, dtype=bool)

    lib = _native_lib() if use_native else None
    if lib is not None:
        import ctypes
        T = observations.shape[0]
        S = params.transition.shape[0]
        O = params.observation.shape[0]
        A = np.ascontiguousarray(params.transition, np.float64)
        C = np.ascontiguousarray(params.observation, np.float64)
        Q = np.ascontiguousarray(params.transition_cov, np.float64)
        R = np.ascontiguousarray(params.observation_cov, np.float64)
        mu0 = np.ascontiguousarray(params.initial_mean, np.float64)
        S0 = np.ascontiguousarray(params.initial_cov, np.float64)
        obs = np.ascontiguousarray(observations)
        miss = np.ascontiguousarray(missing.astype(np.uint8))
        means = np.empty((T, S))
        covs = np.empty((T, S, S))
        pred_means = np.empty((T, S))
        pred_covs = np.empty((T, S, S))
        rc = lib.kalman_filter_native(
            _as_c(A), _as_c(C), _as_c(Q), _as_c(R), _as_c(mu0), _as_c(S0),
            _as_c(obs), miss.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            T, S, O, _as_c(means), _as_c(covs), _as_c(pred_means),
            _as_c(pred_covs))
        if rc == 0:
            return {'means': means, 'covs': covs,
                    'pred_means': pred_means, 'pred_covs': pred_covs}
        # numerical failure: fall through to the numpy path
    A, C = params.transition, params.observation
    T = observations.shape[0]
    S_dim = A.shape[0]

    means = np.empty((T, S_dim))
    covs = np.empty((T, S_dim, S_dim))
    pred_means = np.empty((T, S_dim))
    pred_covs = np.empty((T, S_dim, S_dim))

    # t = 0: measurement update of the prior
    pred_means[0] = params.initial_mean
    pred_covs[0] = params.initial_cov
    if missing[0]:
        means[0], covs[0] = params.initial_mean, params.initial_cov
    else:
        innov = observations[0] - C @ params.initial_mean
        S = C @ params.initial_cov @ C.T + params.observation_cov
        K = np.linalg.solve(S, C @ params.initial_cov).T
        means[0] = params.initial_mean + K @ innov
        covs[0] = _symmetrize(params.initial_cov - K @ C @ params.initial_cov)

    for t in range(1, T):
        means[t], covs[t], pred_means[t], pred_covs[t] = kalman_filter_step(
            params, means[t - 1], covs[t - 1], observations[t], missing[t])

    return {'means': means, 'covs': covs,
            'pred_means': pred_means, 'pred_covs': pred_covs}


_SCAN_OK: Optional[bool] = None


def _scan_available() -> bool:
    '''One-time probe: the jitted f64 scan smoother needs host LAPACK FFI
    handlers that some plugin jax builds (e.g. the tunneled-TPU sandbox) do
    not register for the CPU backend.'''
    global _SCAN_OK
    if _SCAN_OK is None:
        try:
            p = KalmanParams(np.eye(2), np.eye(2), np.eye(2), np.eye(2),
                             np.zeros(2), np.eye(2))
            kalman_smooth_scan(p, np.zeros((3, 2)), np.zeros(3, bool))
            _SCAN_OK = True
        except Exception:   # pragma: no cover - environment dependent
            _SCAN_OK = False
    return _SCAN_OK


def kalman_smooth(params: KalmanParams, observations, missing,
                  use_native: bool = False, backend: Optional[str] = None):
    '''RTS smoother. Returns smoothed means/covs and lag-one covariances
    (V_{t+1, t | T} for t = 0..T-2) for EM.

    ``backend`` is one of ``'steady'`` (Riccati-converged numpy fast path,
    no-missing only), ``'scan'`` (jitted lax.scan, f64 CPU), ``'native'``
    (C++ core), ``'numpy'``, or None = fastest available.
    Measured at production dims (S=60, O=20) on this image's single vCPU:
    T=1000 steady ~45 ms / scan 538 ms / numpy 714 ms / native 866 ms
    (KALMAN_BENCH.md) — auto prefers steady when nothing is missing, then
    scan, native, numpy. ``use_native=True`` forces the C++ core
    (back-compat).'''
    if backend is None:
        if use_native:
            backend = 'native'
        elif not np.any(missing):
            backend = 'steady'
        elif _scan_available():
            backend = 'scan'
        elif _native_lib() is not None:
            backend = 'native'
        else:
            backend = 'numpy'
    if backend == 'steady':
        if np.any(missing):
            raise ValueError("backend='steady' requires no missing rows")
        return kalman_smooth_steady(params, observations)
    if backend == 'scan':
        return kalman_smooth_scan(params, observations, missing)
    use_native = backend == 'native'
    filt = kalman_filter(params, observations, missing, use_native=use_native)
    A = params.transition
    T = filt['means'].shape[0]
    S_dim = A.shape[0]

    lib = _native_lib() if use_native else None
    if lib is not None and T >= 2:
        A_c = np.ascontiguousarray(A, np.float64)
        means = np.ascontiguousarray(filt['means'])
        covs = np.ascontiguousarray(filt['covs'])
        pred_means = np.ascontiguousarray(filt['pred_means'])
        pred_covs = np.ascontiguousarray(filt['pred_covs'])
        s_means = np.empty_like(means)
        s_covs = np.empty_like(covs)
        lag = np.empty((T - 1, S_dim, S_dim))
        rc = lib.kalman_smooth_native(
            _as_c(A_c), _as_c(means), _as_c(covs), _as_c(pred_means),
            _as_c(pred_covs), T, S_dim, _as_c(s_means), _as_c(s_covs),
            _as_c(lag))
        if rc == 0:
            return {'means': s_means, 'covs': s_covs, 'lag_one_covs': lag,
                    'filtered': filt}

    s_means = np.empty_like(filt['means'])
    s_covs = np.empty_like(filt['covs'])
    lag_ones = np.empty((T - 1, S_dim, S_dim))
    s_means[-1] = filt['means'][-1]
    s_covs[-1] = filt['covs'][-1]

    # the smoother gains depend only on filtered quantities, so they batch
    # into ONE vectorized solve: J_t = f_cov_t A' P_{t+1|t}^{-1}. Only the
    # cheap mean/cov recursions stay sequential. (EM runs this 10x per
    # session; the per-step solve loop dominated session startup.)
    if T >= 2:
        J_all = np.linalg.solve(
            filt['pred_covs'][1:],
            np.swapaxes(filt['covs'][:-1] @ A.T, 1, 2))
        J_all = np.ascontiguousarray(np.swapaxes(J_all, 1, 2))
        for t in range(T - 2, -1, -1):
            J = J_all[t]
            s_means[t] = filt['means'][t] + J @ (s_means[t + 1] - filt['pred_means'][t + 1])
            s_covs[t] = _symmetrize(
                filt['covs'][t] + J @ (s_covs[t + 1] - filt['pred_covs'][t + 1]) @ J.T)
            lag_ones[t] = s_covs[t + 1] @ J.T  # V_{t+1, t | T}

    return {'means': s_means, 'covs': s_covs, 'lag_one_covs': lag_ones,
            'filtered': filt}


def kalman_smooth_steady(params: KalmanParams, observations,
                         tol: float = 1e-12):
    '''RTS smoother exploiting Riccati convergence (no-missing fast path).

    With time-invariant params and no missing observations, the filter
    covariance sequence converges to a fixed point after a short transient
    (~50 steps at the 54-dim point tracker); the smoother covariances
    likewise converge backward from T. Covariances and gains are computed
    exactly through the transients and held at their converged values in
    between — below ``tol`` relative change, i.e. at f64 noise — while the
    data-dependent mean recursions (matvecs, not matmuls) still run over
    every step. This is where EM spends its E-steps: measured 4.6 s -> ~1 s
    for the 10-iteration init at T=1000 (KALMAN_BENCH.md).

    Same contract as :func:`kalman_smooth`; only valid when nothing is
    missing (callers fall back otherwise).
    '''
    A, C = params.transition, params.observation
    Q, R = params.transition_cov, params.observation_cov
    obs = np.asarray(observations, np.float64)
    T = obs.shape[0]
    s_dim = A.shape[0]

    def update_cov(pp):
        innov_cov = C @ pp @ C.T + R
        gain = np.linalg.solve(innov_cov, C @ pp).T
        return gain, _symmetrize(pp - gain @ C @ pp)

    # --- forward covariances: exact until converged ---
    p_pred = [np.asarray(params.initial_cov, np.float64)]
    g0, pf0 = update_cov(p_pred[0])
    p_filt = [pf0]
    gains = [g0]
    k = T  # first index at which covariances are steady
    for t in range(1, T):
        pp = _symmetrize(A @ p_filt[-1] @ A.T + Q)
        gain, pf = update_cov(pp)
        p_pred.append(pp)
        p_filt.append(pf)
        gains.append(gain)
        if np.max(np.abs(pf - p_filt[-2])) <= tol * max(1.0, np.abs(pf).max()):
            k = t
            break
    pf_ss, pp_ss, k_ss = p_filt[-1], p_pred[-1], gains[-1]

    # --- forward means: per-step matvecs over all T ---
    f_means = np.empty((T, s_dim))
    pred_means = np.empty((T, s_dim))
    pred_means[0] = params.initial_mean
    f_means[0] = params.initial_mean + gains[0] @ (obs[0] - C @ params.initial_mean)
    for t in range(1, T):
        gain = gains[t] if t <= k else k_ss
        pm = A @ f_means[t - 1]
        pred_means[t] = pm
        f_means[t] = pm + gain @ (obs[t] - C @ pm)

    # materialized covariance sequences (steady beyond the transient)
    f_covs = np.empty((T, s_dim, s_dim))
    p_covs = np.empty((T, s_dim, s_dim))
    n_exact = len(p_filt)
    f_covs[:n_exact] = p_filt
    p_covs[:n_exact] = p_pred
    f_covs[n_exact:] = pf_ss
    p_covs[n_exact:] = pp_ss

    s_means = np.empty((T, s_dim))
    s_covs = np.empty((T, s_dim, s_dim))
    lag_ones = np.empty((max(T - 1, 0), s_dim, s_dim))
    s_means[-1] = f_means[-1]
    s_covs[-1] = f_covs[-1]

    if T >= 2:
        j_ss = np.linalg.solve(pp_ss, (pf_ss @ A.T).T).T
        j_exact = [np.linalg.solve(p_pred[t + 1], (p_filt[t] @ A.T).T).T
                   for t in range(n_exact - 1)]

        # backward covariances: exact until converged (moving back from T),
        # steady in the middle, exact again through the forward transient
        v_next = s_covs[-1]
        converged_at = None
        for t in range(T - 2, -1, -1):
            j_t = j_exact[t] if t < n_exact - 1 else j_ss
            if converged_at is None or t < n_exact - 1:
                v_t = _symmetrize(f_covs[t] + j_t @ (v_next - p_covs[t + 1]) @ j_t.T)
                lag_ones[t] = v_next @ j_t.T
                if (converged_at is None and t >= n_exact - 1
                        and np.max(np.abs(v_t - v_next))
                        <= tol * max(1.0, np.abs(v_t).max())):
                    converged_at = t
                    v_ss, lag_ss = v_t, v_t @ j_ss.T
                s_covs[t] = v_t
                v_next = v_t
            else:
                s_covs[t] = v_ss
                lag_ones[t] = lag_ss
                v_next = v_ss

        # backward means: per-step matvecs over all T
        for t in range(T - 2, -1, -1):
            j_t = j_exact[t] if t < n_exact - 1 else j_ss
            s_means[t] = f_means[t] + j_t @ (s_means[t + 1] - pred_means[t + 1])

    return {'means': s_means, 'covs': s_covs, 'lag_one_covs': lag_ones,
            'filtered': {'means': f_means, 'covs': f_covs,
                         'pred_means': pred_means, 'pred_covs': p_covs}}


def _scan_smoother():
    '''Build (once) the jitted lax.scan RTS smoother. f64 via the scoped
    ``enable_x64`` context on the CPU backend (TPUs have no f64; a square-root
    f32 form would be needed there, and the sequential tiny-matrix recurrence
    could not use the MXU anyway — see KALMAN_BENCH.md for measurements).'''
    import jax
    import jax.numpy as jnp

    def smooth(A, C, Q, R, mu0, S0, obs, miss):
        def update(pred_mean, pred_cov, y, m):
            S = C @ pred_cov @ C.T + R
            K = jnp.linalg.solve(S, C @ pred_cov).T
            upd_mean = pred_mean + K @ (y - C @ pred_mean)
            upd_cov = pred_cov - K @ C @ pred_cov
            upd_cov = (upd_cov + upd_cov.T) / 2
            return (jnp.where(m, pred_mean, upd_mean),
                    jnp.where(m, pred_cov, upd_cov))

        # t = 0: measurement update of the prior (pykalman semantics)
        m0, c0 = update(mu0, S0, obs[0], miss[0])

        def fstep(carry, inp):
            mean, cov = carry
            y, m = inp
            pred_mean = A @ mean
            pred_cov = A @ cov @ A.T + Q
            pred_cov = (pred_cov + pred_cov.T) / 2
            mean, cov = update(pred_mean, pred_cov, y, m)
            return (mean, cov), (mean, cov, pred_mean, pred_cov)

        _, (fm, fc, pm, pc) = jax.lax.scan(fstep, (m0, c0), (obs[1:], miss[1:]))
        f_means = jnp.concatenate([m0[None], fm])
        f_covs = jnp.concatenate([c0[None], fc])
        p_means = jnp.concatenate([mu0[None], pm])
        p_covs = jnp.concatenate([S0[None], pc])

        # all smoother gains batch into one solve (as in the numpy path)
        J = jnp.linalg.solve(p_covs[1:], jnp.swapaxes(f_covs[:-1] @ A.T, 1, 2))
        J = jnp.swapaxes(J, 1, 2)

        def bstep(carry, inp):
            next_mean, next_cov = carry
            fmt, fct, pm_next, pc_next, Jt = inp
            sm = fmt + Jt @ (next_mean - pm_next)
            sc = fct + Jt @ (next_cov - pc_next) @ Jt.T
            sc = (sc + sc.T) / 2
            lag = next_cov @ Jt.T        # V_{t+1, t | T}
            return (sm, sc), (sm, sc, lag)

        _, (sm, sc, lag) = jax.lax.scan(
            bstep, (f_means[-1], f_covs[-1]),
            (f_means[:-1], f_covs[:-1], p_means[1:], p_covs[1:], J),
            reverse=True)
        s_means = jnp.concatenate([sm, f_means[-1:]])
        s_covs = jnp.concatenate([sc, f_covs[-1:]])
        return (s_means, s_covs, lag,
                (f_means, f_covs, p_means, p_covs))

    return jax.jit(smooth)


_SCAN_SMOOTHER = None


def kalman_smooth_scan(params: KalmanParams, observations, missing):
    '''RTS smoother as one jitted ``lax.scan`` program on the CPU backend
    (f64). Same contract as :func:`kalman_smooth`. Kept as a selectable
    backend: the recurrence is inherently sequential over tiny (≤54-dim)
    matrices, so it belongs on host either way — see KALMAN_BENCH.md for the
    numpy / C++ / scan comparison that picked the default.'''
    global _SCAN_SMOOTHER
    import jax
    cpu = jax.devices('cpu')[0]
    observations = np.asarray(observations, np.float64)
    missing = np.asarray(missing, bool)
    with jax.enable_x64(True), jax.default_device(cpu):
        if _SCAN_SMOOTHER is None:
            _SCAN_SMOOTHER = _scan_smoother()
        s_means, s_covs, lag, filt = _SCAN_SMOOTHER(
            params.transition, params.observation, params.transition_cov,
            params.observation_cov, params.initial_mean, params.initial_cov,
            observations, missing)
        out = jax.device_get(((s_means, s_covs, lag), filt))
    (s_means, s_covs, lag), (f_means, f_covs, p_means, p_covs) = out
    return {'means': s_means, 'covs': s_covs, 'lag_one_covs': lag,
            'filtered': {'means': f_means, 'covs': f_covs,
                         'pred_means': p_means, 'pred_covs': p_covs}}


def _angle_scan_filter():
    '''Build (once) the jitted angle-intervention scan: the per-frame
    sample -> intervene -> filter_update recurrence of
    m2de/proc/proc.py:769-818 as ONE ``lax.scan`` program (f64, CPU backend).

    The observation is the (sin, cos) pair of the angle tracker, so the 2x2
    innovation system is inverted analytically — no LAPACK dependency, which
    keeps this backend available on plugin jax builds where
    ``jnp.linalg.solve`` is not registered for CPU.
    '''
    import jax
    import jax.numpy as jnp

    def run(A, C, Q, R, mean0, cov0, angles, scores, order,
            align_thresh, dev_thresh):
        def step(carry, inp):
            mean, cov = carry
            angle, score = inp

            # sample(1): predicted next angle from the transition alone
            pred_state = A @ mean
            p_next = jnp.rad2deg(jnp.arctan2(pred_state[0], pred_state[order]))
            p_next = jnp.where(p_next < 0, p_next + 360.0, p_next) % 360.0

            # smallest signed difference angle - p_next (proc/angles.py)
            diff = (angle - p_next) % 360.0
            rel = jnp.where(diff > 180.0, diff - 360.0, diff)

            low_align = score < align_thresh          # NaN -> False
            big_dev = jnp.abs(rel) > dev_thresh       # NaN -> False
            flipped = (angle + 180.0) % 360.0
            angle_out = jnp.where(low_align, p_next,
                                  jnp.where(big_dev, flipped, angle))
            flip_delta = jnp.logical_and(jnp.logical_not(low_align), big_dev)

            # filter_update(angle_out): predict + 2D measurement update
            rad = jnp.deg2rad(angle_out)
            obs = jnp.stack([jnp.sin(rad), jnp.cos(rad)])
            missing = jnp.logical_not(jnp.all(jnp.isfinite(obs)))
            obs = jnp.nan_to_num(obs)

            pred_cov = A @ cov @ A.T + Q
            pred_cov = (pred_cov + pred_cov.T) / 2
            innov = obs - C @ pred_state
            S = C @ pred_cov @ C.T + R                      # (2, 2)
            det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
            S_inv = jnp.array([[S[1, 1], -S[0, 1]],
                               [-S[1, 0], S[0, 0]]]) / det
            PCt = pred_cov @ C.T                            # (S, 2)
            K = PCt @ S_inv
            upd_mean = pred_state + K @ innov
            upd_cov = pred_cov - K @ C @ pred_cov
            upd_cov = (upd_cov + upd_cov.T) / 2

            new_mean = jnp.where(missing, pred_state, upd_mean)
            new_cov = jnp.where(missing, pred_cov, upd_cov)
            return (new_mean, new_cov), (angle_out, flip_delta)

        (mean, cov), (out_angles, flip_deltas) = jax.lax.scan(
            step, (mean0, cov0), (angles, scores))
        return out_angles, flip_deltas, mean, cov

    return jax.jit(run, static_argnames=('order',))


_ANGLE_SCAN = None


def angle_intervention_filter(params: KalmanParams, mean0, cov0,
                              angles, align_scores, order: int = 3,
                              align_thresh: float = 0.4,
                              dev_thresh: float = 140.0):
    '''Vectorized angle-intervention loop (m2de/proc/proc.py:769-818).

    For each frame: 1-step-ahead prediction from the angle tracker; if the
    keypoint alignment score is below ``align_thresh`` the angle defers to
    the prediction; else if the predicted-vs-observed deviation exceeds
    ``dev_thresh`` degrees the angle flips 180; the (possibly corrected)
    angle then drives a streaming filter update.

    Returns (angles_out (T,), flip_deltas bool (T,), last_mean, last_cov).
    Exactly matches the per-frame Python loop (tests/test_features.py).
    '''
    global _ANGLE_SCAN
    import jax
    cpu = jax.devices('cpu')[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        if _ANGLE_SCAN is None:
            _ANGLE_SCAN = _angle_scan_filter()
        out = _ANGLE_SCAN(
            np.asarray(params.transition, np.float64),
            np.asarray(params.observation, np.float64),
            np.asarray(params.transition_cov, np.float64),
            np.asarray(params.observation_cov, np.float64),
            np.asarray(mean0, np.float64), np.asarray(cov0, np.float64),
            np.asarray(angles, np.float64),
            np.asarray(align_scores, np.float64),
            order, align_thresh, dev_thresh)
        out = jax.device_get(out)
    return out


def _em_step(params: KalmanParams, observations, missing):
    sm = kalman_smooth(params, observations, missing)
    mu, V, lag = sm['means'], sm['covs'], sm['lag_one_covs']
    A, C = params.transition, params.observation
    T = observations.shape[0]

    # sufficient statistics, summed over time FIRST so everything is O(T S^2)
    # BLAS instead of (T, S, S) einsum temporaries:
    #   sum_t E[x_t x_t']     = sum_t V_t + M' M
    #   sum_t E[x_{t+1} x_t'] = sum_t lag_t + M[1:]' M[:-1]
    sum_Ext_head = V[:-1].sum(axis=0) + mu[:-1].T @ mu[:-1]
    sum_Ext_tail = V[1:].sum(axis=0) + mu[1:].T @ mu[1:]
    sum_Ext1 = lag.sum(axis=0) + mu[1:].T @ mu[:-1]

    # transition covariance: Q = mean(C_t - B_t A' - A B_t' + A D_t A')
    sum_B_At = sum_Ext1 @ A.T
    Q = (sum_Ext_tail - sum_B_At - sum_B_At.T
         + A @ sum_Ext_head @ A.T) / (T - 1)
    Q = _clip_psd(Q)

    # observation covariance over observed timesteps only
    obs_w = (~np.asarray(missing, bool)).astype(np.float64)
    resid = (np.asarray(observations, np.float64) - mu @ C.T) * obs_w[:, None]
    R_resid = resid.T @ resid
    V_w = np.tensordot(obs_w, V, axes=1)      # sum_t w_t V_t, (S, S)
    R_state = C @ V_w @ C.T
    nobs = max(obs_w.sum(), 1.0)
    R = _clip_psd((R_resid + R_state) / nobs)

    # initial state covariance
    d0 = mu[0] - params.initial_mean
    S0 = _clip_psd(V[0] + np.outer(d0, d0))

    return params._replace(transition_cov=Q, observation_cov=R, initial_cov=S0)


def kalman_em(params: KalmanParams, observations, missing, n_iter: int = 10) -> KalmanParams:
    '''EM for (transition_cov, observation_cov, initial_cov); matches the
    reference's em_vars selection (m2de/proc/kalman.py:322-333).'''
    observations = np.asarray(observations, dtype=np.float64)
    missing = np.asarray(missing, dtype=bool)
    for _ in range(n_iter):
        params = _em_step(params, observations, missing)
    return params


# ---------------------------------------------------------------------------
# tracker-item specifications (block-diagonal matrix builders)
# ---------------------------------------------------------------------------

class KalmanTrackerItem(ABC):
    '''Spec for one tracked quantity (m2de/proc/kalman.py:101-141).'''

    def __init__(self, order: int = 3, delta_t: float = 1.0):
        self.order = order
        self.delta_t = delta_t

    @property
    def state_size(self) -> int:
        '''Size of this item's state block.'''
        return np.atleast_2d(self.build_observ_mat()).shape[-1]

    @abstractmethod
    def build_trans_mat(self) -> np.ndarray:
        '''Transition matrix block.'''

    @abstractmethod
    def build_observ_mat(self) -> np.ndarray:
        '''Observation matrix block.'''

    @abstractmethod
    def build_init_state_means(self, data: np.ndarray) -> np.ndarray:
        '''Initial state mean block.'''

    def format_data(self, data: np.ndarray) -> np.ndarray:
        '''Map user data to observation columns.'''
        return data

    def inverse_format_data(self, data: np.ndarray) -> np.ndarray:
        '''Map state rows back to user data (keep every order-th column).'''
        return data[:, ::self.order]


class KalmanTrackerPoint1D(KalmanTrackerItem):
    '''Constant-jerk 1D point (m2de/proc/kalman.py:143-190).'''

    def _derivatives(self):
        dt = self.delta_t
        return [1.0, dt, dt ** 2 / 2, dt ** 3 / 6][:self.order]

    def build_trans_mat(self):
        derivs = self._derivatives()
        mat = np.zeros((self.order, self.order))
        for d in range(self.order):
            for i, j in enumerate(range(d, self.order)):
                mat[d, j] = derivs[i]
        return mat

    def build_observ_mat(self):
        mat = np.zeros((self.order,))
        mat[0] = 1
        return mat

    def build_init_state_means(self, data: np.ndarray):
        means = np.zeros((self.order,))
        data = np.asarray(data)
        if data.shape[0] > 0:
            first = data[0]
            means[0] = first if np.isfinite(first) else 0.0
        return means


class KalmanTrackerPoint2D(KalmanTrackerPoint1D):
    '''Constant-jerk 2D point.'''

    def build_trans_mat(self):
        one = super().build_trans_mat()
        return scipy.linalg.block_diag(one, one)

    def build_observ_mat(self):
        one = super().build_observ_mat()
        return scipy.linalg.block_diag(one, one)

    def build_init_state_means(self, data: np.ndarray):
        return np.hstack((super().build_init_state_means(data[:, 0]),
                          super().build_init_state_means(data[:, 1])))


class KalmanTrackerAngle(KalmanTrackerPoint2D):
    '''Angle tracked on the unit circle as (sin, cos)
    (m2de/proc/kalman.py:212-236).'''

    def __init__(self, order: int = 3, delta_t: float = 1.0, degrees: bool = True):
        super().__init__(order=order, delta_t=delta_t)
        self.degrees = degrees

    def build_init_state_means(self, data: np.ndarray):
        return super().build_init_state_means(self.format_data(np.asarray(data)))

    def format_data(self, data: np.ndarray):
        data = np.asarray(data, dtype=float)
        if self.degrees:
            data = np.deg2rad(data)
        return np.column_stack([np.sin(data), np.cos(data)])

    def inverse_format_data(self, data: np.ndarray):
        data = data[:, ::self.order]
        angles = np.arctan2(data[:, 0], data[:, 1])
        angles = np.where(angles < 0, 2 * np.pi + angles, angles)
        if self.degrees:
            angles = np.rad2deg(angles)
        return angles


class KalmanTrackerNPoints2D(KalmanTrackerPoint2D):
    '''N 2D points tracked jointly (m2de/proc/kalman.py:239-278).'''

    def __init__(self, n_points: int, order: int = 3, delta_t: float = 1.0):
        self.n_points = n_points
        super().__init__(order, delta_t)

    def build_trans_mat(self):
        one = super().build_trans_mat()
        return scipy.linalg.block_diag(*([one] * self.n_points))

    def build_observ_mat(self):
        one = super().build_observ_mat()
        return scipy.linalg.block_diag(*([one] * self.n_points))

    def build_init_state_means(self, data: np.ndarray):
        one_point = super().build_init_state_means
        return np.hstack([one_point(data[:, i, :]) for i in range(self.n_points)])

    def format_data(self, data: np.ndarray) -> np.ndarray:
        return np.asarray(data).reshape(data.shape[0], -1)

    def inverse_format_data(self, data: np.ndarray) -> np.ndarray:
        return data[:, ::self.order].reshape(data.shape[0], self.n_points, -1)


class KalmanTracker:
    '''Composable multi-item Kalman tracker (m2de/proc/kalman.py:281-418).

    Holds host-side f64 params + streaming state carried across chunks.
    Per-chunk smoothing dispatches to the fastest available backend
    (see :func:`kalman_smooth`): a jitted ``lax.scan`` program on the CPU
    jax backend where its f64 LAPACK calls are registered, else the C++
    core, else numpy. The recurrence is sequential over ≤60-dim matrices —
    there is no MXU work in it, and f64 does not exist on TPU, so the TPU
    chip is deliberately left to the image pipeline (measurements in
    KALMAN_BENCH.md).
    '''

    def __init__(self, items_to_track: Sequence[KalmanTrackerItem]):
        if not items_to_track:
            raise ValueError('need at least one KalmanTrackerItem')
        timesteps = [item.delta_t for item in items_to_track]
        if not np.allclose(timesteps, timesteps[0]):
            raise ValueError('all items must share delta_t')
        self.items = list(items_to_track)
        self.params: Optional[KalmanParams] = None
        self.last_mean: Optional[np.ndarray] = None
        self.last_covar: Optional[np.ndarray] = None

    @property
    def is_initialized(self) -> bool:
        '''True once initialize() has run.'''
        return self.params is not None

    # -- matrix assembly ----------------------------------------------------
    def _build_trans_mat(self):
        return scipy.linalg.block_diag(*[i.build_trans_mat() for i in self.items])

    def _build_observ_mat(self):
        return scipy.linalg.block_diag(*[i.build_observ_mat() for i in self.items])

    def _build_init_state_means(self, init_data):
        return np.hstack([item.build_init_state_means(np.asarray(init_data[i]))
                          for i, item in enumerate(self.items)])

    def _format_data(self, data):
        cols = [item.format_data(np.asarray(data[i], dtype=float))
                for i, item in enumerate(self.items)]
        return np.column_stack(cols)

    def _inverse_format_data(self, state_rows: np.ndarray):
        out = []
        offset = 0
        for item in self.items:
            out.append(item.inverse_format_data(state_rows[:, offset:offset + item.state_size]))
            offset += item.state_size
        return out

    # -- lifecycle ----------------------------------------------------------
    def initialize(self, init_data: Sequence[np.ndarray]) -> None:
        '''Build matrices and run EM (10 iters) on the finite rows of
        ``init_data`` (m2de/proc/kalman.py:312-337).'''
        if len(init_data) != len(self.items):
            raise ValueError('init_data length must match items')

        A = self._build_trans_mat()
        C = self._build_observ_mat()
        S = A.shape[0]
        O = C.shape[0]
        mu0 = self._build_init_state_means(init_data)
        params = KalmanParams(
            transition=np.asarray(A, np.float64),
            observation=np.asarray(C, np.float64),
            transition_cov=np.eye(S),
            observation_cov=np.eye(O),
            initial_mean=np.asarray(mu0, np.float64),
            initial_cov=np.eye(S),
        )

        obs = self._format_data(init_data)
        finite_rows = np.isfinite(obs).all(axis=1)
        if finite_rows.sum() > 1:
            finite_obs = obs[finite_rows]
            missing = np.zeros((finite_obs.shape[0],), bool)
            params = kalman_em(params, finite_obs, missing, n_iter=10)

        self.params = params
        self.last_mean = np.asarray(params.initial_mean)
        self.last_covar = np.asarray(params.initial_cov)

    def _obs_and_missing(self, data):
        obs = self._format_data(data)
        missing = ~np.isfinite(obs).all(axis=1)
        obs = np.nan_to_num(obs, nan=0.0, posinf=0.0, neginf=0.0)
        return obs.astype(np.float64), missing

    def smooth(self, data: Sequence[np.ndarray]):
        '''Smooth a chunk without updating streaming state.'''
        obs, missing = self._obs_and_missing(data)
        sm = kalman_smooth(self.params, obs, missing)
        return self._inverse_format_data(np.asarray(sm['means']))

    def smooth_update(self, data: Sequence[np.ndarray]):
        '''Smooth a chunk and carry the final state into the next chunk
        (m2de/proc/kalman.py:386-400).'''
        obs, missing = self._obs_and_missing(data)
        if obs.shape[0] == 1:
            return self.filter_update(data)
        params = self.params._replace(initial_mean=np.asarray(self.last_mean, np.float64),
                                      initial_cov=np.asarray(self.last_covar, np.float64))
        sm = kalman_smooth(params, obs, missing)
        means = np.asarray(sm['means'])
        covs = np.asarray(sm['covs'])
        self.last_mean = means[-1]
        self.last_covar = covs[-1]
        self.params = self.params._replace(initial_mean=means[-1], initial_cov=covs[-1])
        return self._inverse_format_data(means)

    def filter(self, data: Sequence[np.ndarray]):
        '''Forward-filter a chunk without updating streaming state.'''
        obs, missing = self._obs_and_missing(data)
        filt = kalman_filter(self.params, obs, missing)
        return self._inverse_format_data(np.asarray(filt['means']))

    def filter_update(self, data: Sequence[np.ndarray]):
        '''Streaming one-step filter update (m2de/proc/kalman.py:408-418).'''
        obs, missing = self._obs_and_missing(data)
        mean, cov, _, _ = kalman_filter_step(
            self.params, np.asarray(self.last_mean, np.float64),
            np.asarray(self.last_covar, np.float64), obs[0], bool(missing[0]))
        self.last_mean = np.asarray(mean)
        self.last_covar = np.asarray(cov)
        return self._inverse_format_data(self.last_mean[None, :])

    def sample(self, n_timesteps: int = 1, init_data=None):
        '''Deterministic n-step-ahead mean prediction (the reference drew a
        stochastic pykalman sample; see module docstring).'''
        if init_data is not None:
            state = self._build_init_state_means(init_data)
        else:
            state = np.asarray(self.last_mean)
        A = np.asarray(self.params.transition)
        for _ in range(n_timesteps):
            state = A @ state
        return self._inverse_format_data(state[None, :])
