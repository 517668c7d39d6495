from rsyslog_spark.plans.ruleset import (
    Action,
    Call,
    Foreach,
    If,
    PriFilt,
    PropFilt,
    Ruleset,
    RulesetEngine,
    Set,
    Stop,
    Unset,
    varname,
)

__all__ = [
    "Action", "Call", "Foreach", "If", "PriFilt", "PropFilt",
    "Ruleset", "RulesetEngine", "Set", "Stop", "Unset", "varname",
]
