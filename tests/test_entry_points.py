'''CLI smoke tests + module import tests (reference test strategy:
tests/test_entry_points.py — every command answers --help, every module
imports).'''
import importlib
import pkgutil

import pytest
from click.testing import CliRunner

import moseq2_detectron_extract_tpu
from moseq2_detectron_extract_tpu.cli import cli

ALL_COMMANDS = sorted(cli.commands.keys())

EXPECTED_COMMANDS = {
    'extract', 'train', 'evaluate', 'convert-raw-to-avi', 'visualize-raw',
    'find-roi', 'generate-dataset', 'dataset-info', 'infer-dataset',
    'compile-model', 'find-outliers', 'system-info', 'visualize-result',
    'manual-flip', 'verify-flips', 'generate-extract-config', 'extract-batch',
    'trim-result',
}


def test_all_reference_commands_present():
    assert EXPECTED_COMMANDS <= set(ALL_COMMANDS), \
        f'missing commands: {EXPECTED_COMMANDS - set(ALL_COMMANDS)}'


@pytest.mark.parametrize('command', ALL_COMMANDS)
def test_command_help(command):
    result = CliRunner().invoke(cli, [command, '--help'])
    assert result.exit_code == 0, result.output


def _iter_modules():
    prefix = moseq2_detectron_extract_tpu.__name__ + '.'
    for info in pkgutil.walk_packages(moseq2_detectron_extract_tpu.__path__, prefix):
        if 'libkalman' in info.name or 'libprep' in info.name:
            continue  # built shared libraries, not importable modules
        yield info.name


@pytest.mark.parametrize('module', sorted(_iter_modules()))
def test_module_imports(module):
    importlib.import_module(module)


@pytest.mark.parametrize('order', [
    ('moseq2_detectron_extract_tpu.ops', 'moseq2_detectron_extract_tpu.cli'),
    ('moseq2_detectron_extract_tpu.models', 'moseq2_detectron_extract_tpu.ops'),
    ('moseq2_detectron_extract_tpu.proc.util', 'moseq2_detectron_extract_tpu.models'),
])
def test_no_circular_imports_fresh_interpreter(order):
    '''Import-order independence, in a FRESH interpreter (regression test for
    the round-1 ops<->models cycle: ops imported first broke cli import).'''
    import subprocess
    import sys
    code = '; '.join(f'import {m}' for m in order)
    proc = subprocess.run([sys.executable, '-c', code], capture_output=True,
                          text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr


def test_generate_extract_config(tmp_path):
    out = tmp_path / 'cfg.yaml'
    result = CliRunner().invoke(cli, ['generate-extract-config', '-o', str(out)])
    assert result.exit_code == 0, result.output
    assert out.exists()
    import yaml
    data = yaml.safe_load(out.read_text())
    assert data['chunk_size'] == 1000
    assert tuple(data['crop_size']) == (80, 80)
