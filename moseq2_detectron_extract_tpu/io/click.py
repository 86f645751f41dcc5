'''Click helpers: config-file-backed commands, default extraction, annotations.

Parity target: m2de/io/click.py (command_with_config :78-140 with precedence
CLI > config file > defaults, get_command_defaults :51-73, click_param_annot,
OptionalParamType :9-18).
'''
from typing import Dict, Optional

import click

from moseq2_detectron_extract_tpu.io.util import read_yaml


class OptionalParamType(click.ParamType):
    '''A param type that also accepts None/empty values.'''

    def __init__(self, param_type: click.ParamType):
        self.param_type = param_type
        self.name = f'optional {param_type.name}'

    def convert(self, value, param, ctx):
        if value is None or value == '' or value == 'None':
            return None
        return self.param_type.convert(value, param, ctx)


def command_with_config(config_file_param_name: str):
    '''Build a click.Command subclass whose defaults can come from a yaml
    config file named by ``config_file_param_name``.

    Precedence: explicit CLI values > config-file values > click defaults.
    '''

    class CustomCommandClass(click.Command):
        def invoke(self, ctx):
            config_file = ctx.params.get(config_file_param_name)
            if config_file is not None:
                config_data = read_yaml(config_file) or {}
                for param, value in ctx.params.items():
                    alt_name = param.replace('_', '-')
                    if param in config_data or alt_name in config_data:
                        config_value = config_data.get(param, config_data.get(alt_name))
                        source = ctx.get_parameter_source(param)
                        if source in (click.core.ParameterSource.DEFAULT,
                                      click.core.ParameterSource.DEFAULT_MAP):
                            if isinstance(value, tuple) and config_value is not None:
                                config_value = tuple(config_value)
                            ctx.params[param] = config_value
            return super().invoke(ctx)

    return CustomCommandClass


def get_command_defaults(command: click.Command, skip_required: bool = True) -> Dict:
    '''Collect the default values of a command's options
    (m2de/io/click.py:51-73).'''
    out = {}
    for param in command.params:
        if param.name is None:
            continue
        if skip_required and getattr(param, 'required', False):
            continue
        if isinstance(param, click.Option):
            default = param.default
            if callable(default):
                default = default()
            if default is not None and not isinstance(default, (str, int, float,
                                                                bool, tuple, list)):
                continue  # skip non-serializable sentinels (e.g. click UNSET)
            out[param.name] = default
    return out


def click_param_annot(command: click.Command) -> Dict[str, Optional[str]]:
    '''Map option names to their help strings (embedded into h5 attrs,
    m2de/io/result.py:92-93).'''
    out = {}
    for param in command.params:
        if isinstance(param, click.Option):
            out[param.name] = param.help
    return out
