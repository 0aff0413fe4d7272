# Makes tests/ a package so pytest imports every module once, as
# tests.test_x — matching the explicit `from tests.test_train_steps import`
# helper imports in test_trainer/test_export/test_parallel (without this,
# those modules were imported twice under two names, duplicating their
# module-level state).
