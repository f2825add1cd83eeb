"""
Example-script smoke tests: every `examples/*.py` must run end-to-end on the
virtual CPU mesh (they are the documented entry points — rot here is user-
facing). Each main() is executed in-process; sizes inside the examples are
already CPU-scaled (32³, ~10 steps).
"""
import os
import runpy

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')


@pytest.mark.parametrize('script', sorted(
    f for f in os.listdir(EXAMPLES) if f.endswith('.py')))
def test_example_runs(script, capsys):
    runpy.run_path(os.path.join(EXAMPLES, script), run_name='__main__')
    out = capsys.readouterr().out
    assert 'nan' not in out.lower(), f'{script} printed NaNs:\n{out}'
