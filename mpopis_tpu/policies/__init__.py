from mpopis_tpu.policies.config import (
    KIND_ALIASES,
    POLICY_KINDS,
    PolicyConfig,
    PolicyState,
    canonical_kind,
    init_policy_state,
)
from mpopis_tpu.policies.driver import Policy, make_policy

__all__ = [
    "KIND_ALIASES",
    "POLICY_KINDS",
    "PolicyConfig",
    "PolicyState",
    "canonical_kind",
    "init_policy_state",
    "Policy",
    "make_policy",
]
