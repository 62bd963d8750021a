"""Driver-contract tests: multichip dryrun must compile+run on a CPU mesh."""

import sys

import pytest


class TestDryrunMultichip:
    def test_dryrun_8_devices(self):
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)  # dp=4 x tp=2 mesh; raises on failure

    def test_dryrun_odd_device_count(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(1)  # single device degenerates to 1x1
