from apr_tpu.eval.tester import FeatureTester, TestStats

__all__ = ["FeatureTester", "TestStats"]
