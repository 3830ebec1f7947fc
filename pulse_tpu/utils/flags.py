"""Global runtime flag singleton (≙ phc/utils/flags.py:1-13).

Host-side toggles only — these select which jitted program variants run
(test/debug/im_eval modes), they never appear inside traces.
"""


class _Flags:
    def __init__(self, items):
        for k, v in items.items():
            setattr(self, k, v)


flags = _Flags(
    {
        "test": False,
        "debug": False,
        "im_eval": False,
        "follow": False,
        "fixed": False,
        "divide_group": False,
        "no_collision_check": False,
        "fixed_path": False,
        "real_path": False,
        "show_traj": False,
        "server_mode": False,
        "slow": False,
        "real_traj": False,
        "add_proj": False,
        "has_eval": False,
        "trigger_input": False,
        "demo": False,
    }
)
