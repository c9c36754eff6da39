from .audit import audit_plan, plan_of  # noqa: F401
