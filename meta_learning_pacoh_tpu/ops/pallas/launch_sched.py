"""Staircase lr-schedule launch planning for the fused training kernels.

The fused mega-kernels take the Adam learning rate as a runtime SMEM scalar
that is constant WITHIN one `pallas_call` launch. The reference's StepLR
schedule (reference: GPR_meta_mll.py:261-262, mirrored here as
`optax.exponential_decay(..., transition_steps=1000, staircase=True)`) only
changes the lr at global-step multiples of the transition, and optax
evaluates the schedule at the pre-increment step count — the lr in effect at
0-based global step s is ``lr0 * decay ** (s // transition)`` (verified
empirically against optax.adamw; see tests/test_fused_lr_decay.py).

So schedule support needs NO kernel change: split each host-side chunk so
that no single launch crosses a staircase boundary, and pass that launch's
lr as the existing runtime scalar. Within-chunk trajectories stay bit-exact
with the XLA step, and chunking determinism is preserved because the lr is a
function of the global step alone.
"""

import jax.numpy as jnp

# Reference StepLR step_size (GPR_meta_mll.py:261). Module-level so tests can
# shrink it to exercise boundary crossings cheaply; read at call time.
LR_TRANSITION_STEPS = 1000


def staircase_lr(lr0, lr_decay, step, transition=None):
    """The lr in effect at 0-based global step ``step`` under the staircase."""
    if lr_decay >= 1.0:
        return float(lr0)
    t = LR_TRANSITION_STEPS if transition is None else int(transition)
    return float(lr0) * float(lr_decay) ** (int(step) // t)


def staircase_launches(step0, n_steps, max_launch, lr_decay=1.0,
                       transition=None):
    """Yield ``(launch_step0, sub_steps)`` covering [step0, step0 + n_steps).

    Each launch is capped at ``max_launch`` and, when ``lr_decay < 1``, never
    crosses a staircase boundary — so a single runtime lr scalar per launch
    is exact.
    """
    t = LR_TRANSITION_STEPS if transition is None else int(transition)
    step0, n_steps = int(step0), int(n_steps)
    if n_steps > 0 and int(max_launch) < 1:
        raise ValueError(
            f"staircase_launches: max_launch must be >= 1, got {max_launch}"
        )
    done = 0
    while done < n_steps:
        s = step0 + done
        sub = min(int(max_launch), n_steps - done)
        if lr_decay < 1.0:
            sub = min(sub, t - (s % t))
        yield s, sub
        done += sub


def bump_counts(states, total_steps):
    """Stamp ``count=total_steps`` into every count-bearing optax sub-state.

    A fused-path sync rebuilds ScaleByAdamState explicitly; when an lr
    schedule is active the optax chain additionally carries a
    ScaleByScheduleState whose count feeds the schedule — a stale count there
    would resume XLA-path training at the wrong lr. Applied to the trailing
    states of the chain (EmptyStates pass through untouched).
    """
    out = []
    for s in states:
        # NB: check _fields, not hasattr — every namedtuple has a .count()
        # METHOD, so hasattr(s, "count") is true even for EmptyState
        if "count" in getattr(s, "_fields", ()):
            s = s._replace(count=jnp.asarray(total_steps, jnp.int32))
        out.append(s)
    return tuple(out)
