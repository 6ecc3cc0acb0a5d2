"""Grid-tangent-kernel (GTK) spectral analysis.

Re-implements ``/root/reference/FourierGrid/run_gtk_analysis.py`` — the
theory tool behind the paper's figures: compute the tangent kernel
J J^T of a 1-D linearly-interpolated VoxelGrid operator vs the FourierGrid
operator (per-band embedded lookup, mean-reduced), its eigen-spectrum, and a
1-D regression comparison — vectorized JAX instead of per-point Python loops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def voxel_grid_jacobian(grid_len: int = 1000, n_points: int = 100) -> np.ndarray:
    """dy/dw for linear interpolation of points x=idx/n on a 1-D grid
    (run_gtk_analysis.py VoxelGrid.forward)."""
    xs = np.arange(n_points) / n_points
    J = np.zeros((n_points, grid_len))
    left = (xs * grid_len).astype(int)
    right = left + 1
    lw = np.abs(xs - right / grid_len) * grid_len
    rw = np.abs(xs - left / grid_len) * grid_len
    rows = np.arange(n_points)
    valid_l = left >= 0
    valid_r = right < grid_len
    J[rows[valid_l], left[valid_l]] = lw[valid_l]
    J[rows[valid_r], right[valid_r]] = rw[valid_r]
    return J


def _gamma(x: np.ndarray, i: int) -> np.ndarray:
    """Per-band fourier embedding to [0, 1] (reference gamma_x_i; note the
    reference uses python `2^(i//2)` == XOR — reproduced faithfully so the
    spectra match the paper figures)."""
    f = 2 ^ (i // 2)  # XOR, as in the reference
    raw = np.sin(f * np.pi * x) if i % 2 == 0 else np.cos(f * np.pi * x)
    return (raw + 1) / 2


def fourier_grid_jacobian(
    grid_len: int = 1000, band_num: int = 10, n_points: int = 100
) -> np.ndarray:
    """dy/dw for the FourierGrid operator: each band b interpolates at the
    embedded coordinate gamma_b(x) into its own grid bank."""
    xs = np.arange(n_points) / n_points
    J = np.zeros((n_points, grid_len * band_num))
    rows = np.arange(n_points)
    for b in range(band_num):
        g = _gamma(xs, b)
        # clamp the boundary case g == 1.0 (the reference would index past the
        # bank into the next one — a silent bug we do not reproduce)
        left = np.minimum((g * grid_len).astype(int), grid_len - 1)
        right = left + 1
        lw = np.abs(g - right / grid_len) * grid_len
        rw = np.abs(g - left / grid_len) * grid_len
        valid_l = left > 0
        valid_r = right < grid_len
        J[rows[valid_l], grid_len * b + left[valid_l]] = lw[valid_l]
        J[rows[valid_r], grid_len * b + right[valid_r]] = rw[valid_r]
    return J


def gtk(jacobian: np.ndarray) -> np.ndarray:
    return jacobian @ jacobian.T


def gtk_spectrum(kernel: np.ndarray) -> np.ndarray:
    """Sorted (descending) eigenvalues of the tangent kernel."""
    ev = np.linalg.eigvalsh(kernel)
    return ev[::-1]


# ---------------------------------------------------------------------------
# 1-D regression comparison (the paper's convergence experiment)
# ---------------------------------------------------------------------------

def _interp_1d(voxel: jnp.ndarray, x: jnp.ndarray, interval_num: int):
    left = jnp.clip((x * interval_num).astype(jnp.int32), 0, interval_num - 1)
    right = left + 1
    lw = jnp.abs(x - right / interval_num) * interval_num
    rw = jnp.abs(x - left / interval_num) * interval_num
    return voxel[left] * lw + voxel[right] * rw


def voxel_grid_predict(voxel: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(_interp_1d(voxel, x, voxel.shape[0] - 1))


def fourier_grid_predict(voxel: jnp.ndarray, x: jnp.ndarray, grid_len: int,
                         band_num: int) -> jnp.ndarray:
    acc = 0.0
    for b in range(band_num):
        f = 2 ^ (b // 2)
        raw = jnp.sin(f * jnp.pi * x) if b % 2 == 0 else jnp.cos(f * jnp.pi * x)
        g = (raw + 1) / 2
        bank = jax.lax.dynamic_slice_in_dim(voxel, grid_len * b, grid_len)
        acc = acc + _interp_1d(bank, g, grid_len - 1)
    return jax.nn.sigmoid(acc / band_num)


def one_d_regress(
    predict_fn,
    voxel0: jnp.ndarray,
    x_train,
    y_train,
    x_test,
    y_test,
    lr: float = 1e-2,
    iterations: int = 150,
):
    """Adam regression of a 1-D signal; returns (final voxel, train/test loss
    histories) — the train_model loop of the reference."""
    import optax

    tx = optax.adam(lr)
    voxel = voxel0
    opt_state = tx.init(voxel)
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train)
    x_test = jnp.asarray(x_test)
    y_test = jnp.asarray(y_test)

    @jax.jit
    def step(voxel, opt_state):
        def loss_fn(v):
            pred = predict_fn(v, x_train)
            return jnp.sum((pred - y_train) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(voxel)
        updates, opt_state = tx.update(grads, opt_state)
        voxel = optax.apply_updates(voxel, updates)
        test_loss = jnp.mean((predict_fn(voxel, x_test) - y_test) ** 2)
        return voxel, opt_state, loss, test_loss

    hist = []
    for _ in range(iterations):
        voxel, opt_state, tr, te = step(voxel, opt_state)
        hist.append((float(tr), float(te)))
    return voxel, hist


def main(out_path: str = "gtk_analysis.npz", grid_len: int = 100,
         band_num: int = 10, n_points: int = 100):
    """Compute both GTKs + spectra and save for plotting."""
    Jv = voxel_grid_jacobian(grid_len, n_points)
    Jf = fourier_grid_jacobian(grid_len, band_num, n_points)
    Kv, Kf = gtk(Jv), gtk(Jf)
    np.savez_compressed(
        out_path,
        gtk_voxel=Kv,
        gtk_fourier=Kf,
        spectrum_voxel=gtk_spectrum(Kv),
        spectrum_fourier=gtk_spectrum(Kf),
    )
    print(f"GTK analysis written to {out_path}")


if __name__ == "__main__":
    main()
