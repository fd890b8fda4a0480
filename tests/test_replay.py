"""Replay buffer tests: write/readback, episode rollover, window sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from pdecontrol_tpu.data import replay as R
from pdecontrol_tpu.envs.transforms import Identity


def _fill_episodes(rep, n_steps, ep_len, num_envs=2, n=4):
    """Write deterministic transitions: obs value encodes (env, global step)."""
    writer = jax.jit(R.write_step)
    for t in range(n_steps):
        col = t % ep_len
        obs = jnp.full((num_envs, 1, n), float(t)) + jnp.arange(num_envs).reshape(-1, 1, 1) * 1000
        nxt = obs + 0.5
        done = jnp.full((num_envs,), col == ep_len - 1)
        rep = writer(
            rep,
            obs=obs,
            actions=jnp.full((num_envs, 1, 2), float(t)),
            rewards=jnp.full((num_envs,), float(t)),
            terminated=jnp.zeros((num_envs,), bool),
            truncated=done,
            nxtobs=nxt,
            steps=jnp.full((num_envs,), col + 1, jnp.int32),
        )
    return rep


def test_write_and_rollover():
    ep_len, num_envs = 4, 2
    rep = R.create(8, ep_len, num_envs, (1, 4), (1, 2))
    rep = _fill_episodes(rep, 10, ep_len, num_envs)

    # 10 steps = 2 complete episodes (4+4) + 2 steps in progress, per env.
    assert int(rep.ntimesteps) == 20
    assert int(rep.ncomplete) == 4
    np.testing.assert_array_equal(np.asarray(rep.fill[:2]), [4, 4])
    # Each env now writes into its 3rd row.
    assert sorted(np.asarray(rep.row_of_env % 8).tolist()) == [4, 5]

    # First row of env 0: steps 0..3, with obs values 0..3; the terminal
    # frame (slot ep_len) holds the final nxtobs (3.5), which interior slots
    # overwrite with the next step's identical obs in a real env.
    np.testing.assert_allclose(np.asarray(rep.obs_seq[0, :4, 0, 0]), [0, 1, 2, 3])
    np.testing.assert_allclose(float(rep.obs_seq[0, 4, 0, 0]), 3.5)


def test_ring_eviction():
    ep_len, num_envs = 2, 1
    rep = R.create(3, ep_len, num_envs, (1, 4), (1, 2))
    rep = _fill_episodes(rep, 10, ep_len, num_envs)  # 5 episodes into 3 rows
    assert int(rep.next_row) == 1 + 5  # monotone cursor
    # Current row has been recycled and its fill reset.
    assert int(rep.ntimesteps) <= 3 * ep_len


def test_window_sampling_valid_and_distribution():
    ep_len, num_envs = 8, 2
    rep = R.create(8, ep_len, num_envs, (1, 4), (1, 2))
    rep = _fill_episodes(rep, 16, ep_len, num_envs)  # 2 full episodes each

    key = jax.random.PRNGKey(0)
    s = R.sample_windows(rep, key, batch=64, length=3)
    assert s.obs.shape == (64, 3, 1, 4)
    # windows are consecutive: obs value increments by 1 along the window
    diffs = np.diff(np.asarray(s.obs[:, :, 0, 0]), axis=1)
    np.testing.assert_allclose(diffs, 1.0)
    # shifted-view consistency: nxtobs[t] == obs[t+1] within a window.
    np.testing.assert_allclose(
        np.asarray(s.nxtobs[:, :-1, 0, 0]), np.asarray(s.obs[:, 1:, 0, 0])
    )


def test_starting_windows_left_padding():
    ep_len, num_envs = 6, 1
    rep = R.create(4, ep_len, num_envs, (1, 4), (1, 2))
    rep = _fill_episodes(rep, 6, ep_len, num_envs)

    key = jax.random.PRNGKey(1)
    s = R.sample_starting(rep, key, batch=256, tau=4)
    assert s.obs.shape == (256, 4, 1, 4)
    vals = np.asarray(s.obs[:, :, 0, 0])
    # Either strictly consecutive, or left-padded with repeats of the first
    # element (episode-start windows).
    for row in vals:
        d = np.diff(row)
        assert all((x == 1.0) or (x == 0.0) for x in d)
        # once increments start they continue (repeat padding is a prefix)
        if 0.0 in d and 1.0 in d:
            assert d[np.argmax(d == 1.0):].min() == 1.0
    # Some windows should actually be padded prefixes.
    assert (np.diff(vals, axis=1) == 0).any()


def test_partial_done_recycles_claimed_row():
    """With per-env autoreset, a not-done env must never resurrect the stale
    fill/complete of a row a done env just claimed (cumsum offsets give both
    envs the same row index; only done envs may scatter)."""
    rep = R.create(3, 2, 2, (1, 4), (1, 2))
    # Simulate a stale evicted episode on the row about to be claimed.
    rep = rep.replace(
        fill=rep.fill.at[2].set(2),
        complete=rep.complete.at[2].set(True),
    )
    obs = jnp.zeros((2, 1, 4))
    rep = jax.jit(R.write_step)(
        rep,
        obs=obs,
        actions=jnp.zeros((2, 1, 2)),
        rewards=jnp.zeros((2,)),
        terminated=jnp.zeros((2,), bool),
        truncated=jnp.asarray([True, False]),
        nxtobs=obs,
        steps=jnp.ones((2,), jnp.int32),
    )
    # Env 0 finished and claimed row 2: its stale state must be wiped.
    assert np.asarray(rep.row_of_env).tolist() == [2, 1]
    assert int(rep.fill[2]) == 0
    assert not bool(rep.complete[2])
    # Env 1 keeps accumulating on its own row.
    assert int(rep.fill[1]) == 1


def test_transition_sampling_and_stats():
    ep_len, num_envs = 4, 2
    rep = R.create(8, ep_len, num_envs, (1, 4), (1, 2))
    rep = _fill_episodes(rep, 8, ep_len, num_envs)

    s = R.sample_transitions(rep, jax.random.PRNGKey(2), batch=32)
    assert s.obs.shape == (32, 1, 4)
    assert s.rewards.shape == (32,)

    mean, std = R.episode_returns(rep)
    # Episodes: steps 0-3 (return 6) and 4-7 (return 22), twice each.
    np.testing.assert_allclose(float(mean), 14.0)
    np.testing.assert_allclose(float(std), 8.0)

    # Synthetic data: interior deltas are (t+1 - t)/0.5 = 2 (next obs
    # overwrites the written nxtobs slot), terminal deltas 0.5/0.5 = 1.
    # Per row: [2, 2, 2, 1] -> mean 1.75; ddof=1 variance over the 64
    # spatial elements = (48*.0625 + 16*.5625)/63.
    dm, dv = R.delta_statistics(rep, Identity(), delta=0.5)
    np.testing.assert_allclose(float(dm), 1.75)
    np.testing.assert_allclose(float(dv), (48 * 0.0625 + 16 * 0.5625) / 63, rtol=1e-6)


def test_enumerate_windows_non_bootstrap():
    """Deterministic strided enumeration (SubSeqDataset bootstrapping=False,
    dataset.py:54-76): window i of a row starts at i*stride; stride=None
    means non-overlapping; counts match floor((fill-length)/stride)+1."""
    ep_len, num_envs = 10, 1
    rep = R.create(4, ep_len, num_envs, (1, 4), (1, 2))
    rep = _fill_episodes(rep, 20, ep_len, num_envs)  # rows 0,1 full

    s = R.enumerate_windows(rep, length=4, stride=3)
    # Per full row: (10-4)//3+1 = 3 windows at starts 0,3,6; 2 rows -> 6.
    assert s.obs.shape == (6, 4, 1, 4)
    starts = np.asarray(s.steps[:, 0]) - 1  # steps column encodes col+1
    np.testing.assert_array_equal(starts, [0, 3, 6, 0, 3, 6])
    # Windows are contiguous in time.
    np.testing.assert_allclose(
        np.asarray(s.obs[0, :, 0, 0]), np.asarray(rep.obs_seq[0, 0:4, 0, 0])
    )

    # Default stride = length (non-overlapping): (10-4)//4+1 = 2 per row.
    s2 = R.enumerate_windows(rep, length=4)
    assert s2.obs.shape[0] == 4

    # rows_mask restricts the enumeration.
    mask = jnp.zeros((4,), bool).at[1].set(True)
    s3 = R.enumerate_windows(rep, length=4, stride=3, rows_mask=mask)
    assert s3.obs.shape[0] == 3
    assert float(s3.obs[0, 0, 0, 0]) >= 10.0  # row 1 holds steps 10..19
