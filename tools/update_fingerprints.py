#!/usr/bin/env python
"""Refresh the freshness ledger AFTER re-verifying exactly the changed keys.

Usage:
    python tools/update_fingerprints.py             # verify + refresh diffs
    python tools/update_fingerprints.py --dry-run   # list stale keys only
    python tools/update_fingerprints.py --init      # (re)seed all entries
                                                    # WITHOUT verification

The default path diffs live fingerprints (tools/freshness.py source
closure) against tools/verified_fingerprints.json, runs the
neutral-session driver emulation (tools/emulate_driver.py, sf0.01) on the
stale keys, and rewrites their ledger entries only if that run exits 0 —
so a ledger entry always testifies to a green check of the code it
fingerprints. tests/test_freshness.py enforces the invariant.

``--init`` earns NO verification credit (ADVICE r12 item 1: a bare reseed
used to silently convert the rewrite-after-green gate into a no-op): every
seeded entry is written with a ``seeded:`` prefix that
tests/test_freshness.py REJECTS, and a plain follow-up run treats every
seeded entry as stale — the ledger only turns green again once the
emulator has actually re-verified each key. ``--init`` also refuses to run
without the explicit ``--unverified-ok`` confirmation flag.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.freshness import (  # noqa: E402
    LEDGER_PATH,
    live_fingerprints,
    load_ledger,
    save_ledger,
)


def main() -> int:
    live = live_fingerprints()
    if "--init" in sys.argv:
        if "--unverified-ok" not in sys.argv:
            print(
                "--init seeds UNVERIFIED entries (marked 'seeded:', rejected "
                "by tests/test_freshness.py until an emulator run converts "
                "them); pass --unverified-ok to confirm",
                file=sys.stderr,
            )
            return 2
        save_ledger({k: f"seeded:{fp}" for k, fp in live.items()})
        print(
            f"seeded {len(live)} UNVERIFIED fingerprints -> {LEDGER_PATH}; "
            "run tools/update_fingerprints.py to verify and clear the marker"
        )
        return 0

    ledger = load_ledger()
    stale = sorted(
        k for k, fp in live.items() if ledger.get(k) != fp
    )
    dropped = sorted(set(ledger) - set(live))
    if not stale and not dropped:
        print("ledger is current: no stale keys")
        return 0
    print(f"stale keys ({len(stale)}): {stale}")
    if dropped:
        print(f"unregistered keys to drop ({len(dropped)}): {dropped}")
    if "--dry-run" in sys.argv:
        return 1 if stale or dropped else 0

    if stale:
        emu = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "emulate_driver.py")
        proc = subprocess.run(
            [sys.executable, emu, *stale], cwd="/tmp"
        )
        if proc.returncode != 0:
            print("emulation FAILED — ledger not updated", file=sys.stderr)
            return proc.returncode
    for k in stale:
        ledger[k] = live[k]
    for k in dropped:
        del ledger[k]
    save_ledger(ledger)
    print(f"refreshed {len(stale)} entries, dropped {len(dropped)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
