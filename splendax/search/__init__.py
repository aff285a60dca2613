"""On-device search policies (beyond the reference's capability set).

The reference's strongest opponents are one-ply heuristics over the
observation (`scripts/eval_suite.py:10-128`); its engine is far too slow for
lookahead (6k steps/s, one env).  The splendax engine advances ~47M
env-steps/s/chip, which makes brute-force search a practical policy: these
modules run Monte-Carlo lookahead entirely inside jit, using the batched
rules kernel as the simulator.
"""

from .gumbel import gumbel_search_policy  # noqa: F401
from .ismc import (  # noqa: F401
    censored_gumbel_policy,
    censored_mc_policy,
    censored_mc_q,
    determinize,
)
from .mc import mc_search_policy, mc_search_q  # noqa: F401
from .uct import uct_search_policy  # noqa: F401
