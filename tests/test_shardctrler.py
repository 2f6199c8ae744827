"""Shard-controller fold properties — the reference test suite's checks
(src/shardctrler/test_test.go) ported against the pure fold:

- check() (test_test.go:12-54): groups as expected, every shard
  allocated to a live group, max shards/group <= min + 1;
- minimal transfers after Join()s / Leave()s (test_test.go:211-249);
- Move pins without rebalance, Query-by-num returns the exact stored
  config (test_test.go:120-131 via the chain);
- determinism: replicas folding the same log agree bit-for-bit (what
  the lab gets from Raft log order, here from the rule itself).

The registered ``shardctrler_apply_log`` query's Spark-vs-DuckDB parity
runs in tests/test_oracle_parity.py like every registration.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_go_spark.operators.kvstore import N_SHARDS
from map_reduce_go_spark.operators.shardctrler import (
    apply_shard_ops,
    rebalance,
)


def _check(shards: tuple[int, ...], groups: set[int]) -> None:
    """The reference check() invariants for one config."""
    if not groups:
        assert shards == (0,) * N_SHARDS
        return
    assert all(g in groups for g in shards), (shards, groups)
    counts = Counter(shards)
    per_group = [counts.get(g, 0) for g in groups]
    assert max(per_group) <= min(per_group) + 1, (shards, groups)


def _groups_after(ops) -> set[int]:
    groups: set[int] = set()
    for kind, gid, _ in ops:
        if kind == "join":
            groups.add(gid)
        elif kind == "leave":
            groups.discard(gid)
    return groups


# Random well-formed op-logs: joins of fresh gids, leaves/moves over
# currently-live gids. Encoded as a seed list the builder interprets so
# hypothesis shrinks cleanly.
@st.composite
def op_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ops = []
    live: list[int] = []
    next_gid = 1
    for _ in range(n):
        choice = draw(st.integers(min_value=0, max_value=5))
        if not live or choice <= 2:  # bias toward joins so live grows
            ops.append(("join", next_gid, None))
            live.append(next_gid)
            next_gid += 1
        elif choice == 3 and len(live) > 1:
            gid = live.pop(draw(st.integers(0, len(live) - 1)))
            ops.append(("leave", gid, None))
        else:
            gid = live[draw(st.integers(0, len(live) - 1))]
            ops.append(("move", gid, draw(st.integers(0, N_SHARDS - 1))))
    return ops


@settings(max_examples=150, deadline=None)
@given(op_logs())
def test_fold_invariants_on_random_logs(ops):
    """After every Join/Leave: balanced + allocated + MINIMAL — a shard
    moved iff its previous owner left the member set or owned more than
    its new quota (the exact witness of the reference's minimal-transfer
    checks). Moves pin exactly one shard. Folding twice agrees."""
    chain = apply_shard_ops(ops)
    assert chain == apply_shard_ops(ops)  # determinism
    assert chain[0] == (0, (0,) * N_SHARDS)
    groups: set[int] = set()
    for (kind, gid, shard), (num, new), (_, prev) in zip(
        ops, chain[1:], chain[:-1]
    ):
        if kind == "join":
            groups.add(gid)
        elif kind == "leave":
            groups.discard(gid)
        if kind == "move":
            assert new[shard] == gid
            assert all(
                new[s] == prev[s] for s in range(N_SHARDS) if s != shard
            )
            continue
        _check(new, groups)
        # Minimality witness: recompute this step's quotas and assert
        # every moved shard HAD to move.
        counts = Counter(g for g in prev if g in groups)
        if groups:
            n = len(groups)
            base, rem = divmod(N_SHARDS, n)
            by_load = sorted(groups, key=lambda g: (-counts.get(g, 0), g))
            quota = {g: base for g in groups}
            for g in by_load[:rem]:
                quota[g] += 1
            for s in range(N_SHARDS):
                if new[s] != prev[s]:
                    assert (
                        prev[s] not in groups
                        or counts[prev[s]] > quota[prev[s]]
                    ), f"shard {s} moved needlessly at config {num}"


def test_reference_join_leave_scenario():
    """The TestBasic shape (test_test.go:88-131): two joins, then a
    leave of each — configs stay balanced/allocated throughout, and
    after both leave the chain ends back at... the remaining group
    holding everything, then (all left) the zero config."""
    ops = [
        ("join", 1, None),
        ("join", 2, None),
        ("leave", 1, None),
        ("leave", 2, None),
    ]
    chain = apply_shard_ops(ops)
    assert chain[1][1] == (1,) * N_SHARDS
    _check(chain[2][1], {1, 2})
    # Minimal: group 1 kept exactly its quota's worth of its old shards.
    assert sum(1 for a, b in zip(chain[1][1], chain[2][1]) if a == b == 1) == 5
    assert chain[3][1] == (2,) * N_SHARDS
    assert chain[4][1] == (0,) * N_SHARDS


def test_minimal_transfers_after_joins_and_leaves():
    """The reference's named minimal-transfer scenario
    (test_test.go:211-249): with 10 balanced groups, joining 5 more and
    then leaving those 5 moves no shard between SURVIVING groups."""
    base_ops = [("join", g, None) for g in range(1, 11)]
    c1 = apply_shard_ops(base_ops)[-1][1]
    joined = base_ops + [("join", g, None) for g in range(11, 16)]
    c2 = apply_shard_ops(joined)[-1][1]
    # After joins: any shard owned by an old group didn't move.
    for s in range(N_SHARDS):
        if c2[s] <= 10:
            assert c2[s] == c1[s], "non-minimal transfer after Join()s"
    left = joined + [("leave", g, None) for g in range(11, 16)]
    c3 = apply_shard_ops(left)[-1][1]
    for s in range(N_SHARDS):
        if c2[s] <= 10:
            assert c3[s] == c2[s], "non-minimal transfer after Leave()s"
    _check(c3, set(range(1, 11)))


def test_move_then_rebalance_may_undo():
    """Move pins a shard without rebalance; the next Join/Leave
    rebalances over the PINNED assignment (common.go:8-10), so the
    pinned group now owns one extra and sheds per quota."""
    ops = [("join", 1, None), ("join", 2, None), ("move", 2, 0)]
    chain = apply_shard_ops(ops)
    pinned = chain[3][1]
    assert pinned[0] == 2
    # The move created imbalance (6/4 or 4/6 is fine to persist):
    counts = Counter(pinned)
    assert counts[1] + counts[2] == N_SHARDS
    after = apply_shard_ops(ops + [("join", 3, None)])[-1][1]
    _check(after, {1, 2, 3})
    # Largest owner (group 2, 6 shards) got an extra quota slot — it
    # keeps 4 of its own, including the pinned shard 0 (lowest index).
    assert after[0] == 2


def test_rebalance_extras_go_to_largest_owners():
    """The minimality-bearing tie-break: with 3 groups over 10 shards
    (quotas 4/3/3), the +1 extra lands on the group owning most, so no
    shard moves that didn't have to."""
    prev = (1, 1, 1, 1, 2, 2, 2, 3, 3, 3)
    out = rebalance(prev, [1, 2, 3])
    assert out == prev  # 4/3/3 already: zero moves
    # Same groups but the big owner has the HIGHEST gid: still no move.
    prev2 = (3, 3, 3, 3, 2, 2, 2, 1, 1, 1)
    assert rebalance(prev2, [1, 2, 3]) == prev2


def test_multi_group_join_leave_atomic():
    """The reference's Join/Leave RPC shapes carry SEVERAL groups in one
    call (common.go:37-49) — one config transition, one rebalance (the
    TestMulti scenario, test_test.go:253-296): a 3-group join lands
    balanced in a single step; leaving 2 of 3 in one step hands
    everything to the survivor; and minimal transfers hold across the
    multi-join exactly as across chained singles."""
    chain = apply_shard_ops([("join", (1, 2, 3), None)])
    assert len(chain) == 2  # config #0 + ONE transition
    _check(chain[1][1], {1, 2, 3})

    ops = [("join", (1, 2), None), ("join", (3, 4, 5), None)]
    c1 = apply_shard_ops(ops[:1])[-1][1]
    c2 = apply_shard_ops(ops)[-1][1]
    _check(c2, {1, 2, 3, 4, 5})
    for s in range(N_SHARDS):
        if c2[s] in (1, 2):  # old groups never RECEIVE in a join
            assert c2[s] == c1[s], "non-minimal transfer after multi-Join"

    c3 = apply_shard_ops(ops + [("leave", (1, 2, 4, 5), None)])[-1][1]
    assert c3 == (3,) * N_SHARDS

    # Atomic multi-leave != chained single leaves in general (fewer
    # intermediate configs), but both end balanced over the survivors.
    chained = apply_shard_ops(
        ops + [("leave", 1, None), ("leave", 2, None)]
    )[-1][1]
    atomic = apply_shard_ops(ops + [("leave", (1, 2), None)])[-1][1]
    _check(chained, {3, 4, 5})
    _check(atomic, {3, 4, 5})


def test_leave_to_empty_then_rejoin():
    """Leaving the last group returns the zero config (all shards ->
    the invalid group 0, matching config #0's shape, common.go:14-15);
    a later join rebalances from that baseline."""
    chain = apply_shard_ops(
        [("join", 7, None), ("leave", 7, None), ("join", 9, None)]
    )
    assert chain[1][1] == (7,) * N_SHARDS
    assert chain[2][1] == (0,) * N_SHARDS
    assert chain[3][1] == (9,) * N_SHARDS


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=N_SHARDS,
             max_size=N_SHARDS),
    st.sets(st.integers(min_value=1, max_value=12), max_size=12),
)
def test_rebalance_direct_fuzz(prev, groups):
    """rebalance() fuzzed DIRECTLY over arbitrary prior assignments —
    including states only reachable through Move pins (doubled gids,
    orphans, non-member owners) that the op-log generator never
    produces: balanced, allocated, deterministic, and minimal (a shard
    moves iff its owner is gone or held more than its quota)."""
    prev = tuple(prev)
    out = rebalance(prev, groups)
    assert out == rebalance(prev, groups)  # deterministic
    _check(out, set(groups))
    if not groups:
        return
    counts = Counter(g for g in prev if g in groups)
    n = len(groups)
    base, rem = divmod(N_SHARDS, n)
    by_load = sorted(groups, key=lambda g: (-counts.get(g, 0), g))
    quota = {g: base for g in groups}
    for g in by_load[:rem]:
        quota[g] += 1
    moves = 0
    for s in range(N_SHARDS):
        if out[s] != prev[s]:
            moves += 1
            assert (
                prev[s] not in groups or counts[prev[s]] > quota[prev[s]]
            ), f"shard {s} moved needlessly"
    # The move COUNT is exactly the forced minimum: orphans plus
    # over-quota excess.
    forced = sum(1 for s in range(N_SHARDS) if prev[s] not in groups)
    forced += sum(max(0, counts[g] - quota[g]) for g in groups)
    assert moves == forced


def test_op_log_gids_unique_and_never_rejoin(spark, sf_dir):
    """ADVICE r14: the unrolled SQL oracle computes step-i membership as
    (joins with step <= i) MINUS (leaves with step <= i) — a set
    difference, not a running fold. That is equivalent to the Python
    fold ONLY while the derived op-log never joins the same gid twice
    and never rejoins a gid after its leave. Pin that assumption on the
    log itself so a future re-keying of the gid scheme fails loudly here
    instead of silently desynchronizing fold and oracle."""
    from map_reduce_go_spark.operators.shardctrler import shardctrler_op_log

    rows = sorted(
        shardctrler_op_log(spark, sf_dir).collect(), key=lambda r: r.step
    )
    joined: set[int] = set()
    left: set[int] = set()
    for r in rows:
        if r.kind == "join":
            assert r.gid not in joined, f"gid {r.gid} joins twice (step {r.step})"
            assert r.gid not in left, f"gid {r.gid} rejoins after leave (step {r.step})"
            joined.add(r.gid)
        elif r.kind == "leave":
            assert r.gid in joined and r.gid not in left, (r.step, r.gid)
            left.add(r.gid)
        else:  # move targets must reference a still-live gid
            assert r.gid in joined and r.gid not in left, (r.step, r.gid)
