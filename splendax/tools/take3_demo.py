"""Reduced-color Take-3 demo (working replacement for the reference's stale
`simplified_take3_demo.py`, which imports a deleted symbol and cannot run —
see docs/DEFECTS.md #3).

Shows the variant semantics (reference rules.py:48-58, 201-210) on live
engine states:
  * >= 3 bank colors: a combo is legal iff ALL its colors are available;
  * 1-2 colors left: a combo is legal iff available ⊆ combo (3 legal combos
    at 2 colors, 6 at 1), and execution takes only the available subset.

Run: python -m splendax.tools.take3_demo
"""

from __future__ import annotations


def main() -> None:
    from ..utils.cache import setup_runtime

    setup_runtime()

    import jax.numpy as jnp
    import numpy as np

    from ..engine import data as D
    from ..engine import rules as R
    from ..engine.types import initial_state_parity

    names = ["W", "B", "G", "R", "K"]

    def combo_str(i):
        return "+".join(names[c] for c in D.TAKE3_COMBOS[i])

    def show(bank5):
        state = initial_state_parity(0).replace(
            bank=jnp.asarray(list(bank5) + [5], jnp.int32)
        )
        mask = np.asarray(R.legal_mask(state))[:10]
        legal = [combo_str(i) for i in np.flatnonzero(mask)]
        print(f"bank {dict(zip(names, bank5))}: {int(mask.sum())} legal combos"
              f" -> {legal}")
        if mask.any():
            a = int(np.flatnonzero(mask)[0])
            nxt = R.apply_action(state, jnp.int32(a))
            taken = np.asarray(state.bank - nxt.bank)[:5]
            print(f"  executing {combo_str(a)} takes "
                  f"{ {names[i]: int(t) for i, t in enumerate(taken) if t} }")

    print("Full bank (>=3 colors): standard rule, combo needs all 3 colors")
    show([4, 4, 4, 4, 4])
    print("\nOne color exhausted: combos containing it become illegal")
    show([0, 4, 4, 4, 4])
    print("\nTwo colors left: available ⊆ combo — exactly 3 legal combos")
    show([0, 0, 0, 2, 1])
    print("\nOne color left: 6 legal combos, each takes just that one token")
    show([0, 0, 0, 3, 0])
    print("\nEmpty bank: no take-3 at all")
    show([0, 0, 0, 0, 0])


if __name__ == "__main__":
    main()
