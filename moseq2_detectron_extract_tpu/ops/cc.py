'''Batched connected components + largest-component selection on device.

Replaces the per-frame cv2.connectedComponentsWithStats loop of
m2de/proc/proc.py:552-569 (``get_largest_cc``). Labels are propagated with
segmented cummax sweeps: a forward+backward max-scan along rows then columns
spreads each run's max label across the run in one associative-scan pass, so
convergence takes O(#bends) sweep pairs instead of O(diameter) pointwise
steps. Mouse blobs converge in a few sweeps; the iteration budget bounds
worst-case spirals.
'''
import functools

import jax
import jax.numpy as jnp


def _segmented_max_scan(labels: jnp.ndarray, fg: jnp.ndarray, axis: int) -> jnp.ndarray:
    '''Max-scan of ``labels`` along ``axis`` restricted to foreground runs.

    Background pixels reset the scan (labels never leak across gaps).
    Applied forward and backward so an entire run takes its max label.
    '''
    reset = ~fg

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.maximum(av, bv)), ar | br

    def scan(vals, rst, reverse):
        out, _ = jax.lax.associative_scan(combine, (vals, rst), axis=axis, reverse=reverse)
        return out

    fwd = scan(labels, reset, reverse=False)
    both = scan(fwd, reset, reverse=True)
    return jnp.where(fg, both, 0)


@functools.partial(jax.jit, static_argnames=('num_sweeps',))
def connected_components(masks: jnp.ndarray, num_sweeps: int = 8) -> jnp.ndarray:
    '''4-connectivity component labels for binary masks (N, H, W) -> int32 labels.

    Labels are arbitrary positive ints unique per component; background is 0.
    '''
    fg = masks.astype(jnp.bool_)
    n, h, w = fg.shape
    lin = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
    labels = jnp.where(fg, lin[None], 0)

    def sweep(labels, _):
        labels = _segmented_max_scan(labels, fg, axis=2)  # rows
        labels = _segmented_max_scan(labels, fg, axis=1)  # cols
        return labels, None

    labels, _ = jax.lax.scan(sweep, labels, None, length=num_sweeps)
    return labels


@functools.partial(jax.jit, static_argnames=('num_sweeps',))
def largest_cc(masks: jnp.ndarray, num_sweeps: int = 8) -> jnp.ndarray:
    '''Boolean mask of the largest 4-connected component per frame (N, H, W).

    Parity with m2de/proc/proc.py:552-569 (ties broken arbitrarily). Empty
    frames return all-False.
    '''
    fg = masks.astype(jnp.bool_)
    n, h, w = fg.shape
    labels = connected_components(fg, num_sweeps=num_sweeps)

    flat = labels.reshape(n, h * w)
    sizes = jax.vmap(lambda lab: jnp.zeros((h * w + 1,), jnp.int32).at[lab].add(1))(flat)
    sizes = sizes.at[:, 0].set(0)  # background never wins
    best = jnp.argmax(sizes, axis=1).astype(labels.dtype)[:, None, None]
    return (labels == best) & (best > 0)
