import numpy as np
import pytest

from cudapathtracer_tpu.utils import checks

pytestmark = pytest.mark.smoke


def test_checks_disabled_by_default():
    log = checks.CheckLog()
    checks.enable_checks(False)
    assert log.check("s", np.array([np.nan])) is None
    assert "disabled" in log.summary()


def test_checks_detect_nan_inf():
    checks.enable_checks(True)
    try:
        log = checks.CheckLog()
        r = log.check("good", np.ones(4))
        assert r.ok
        r = log.check("bad", np.array([1.0, np.nan, np.inf]))
        assert not r.ok and r.nan == 1 and r.inf == 1
        assert "STAGE ERROR bad" in log.summary()
        with pytest.raises(FloatingPointError):
            log.check("worse", np.array([np.nan]), raise_on_error=True)
    finally:
        checks.enable_checks(False)
