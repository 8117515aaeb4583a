"""Config system tests: YAML loading, nested dataclass reconstruction,
CLI key=value overrides (reference update_config/merge_from_list parity,
config/default.py:152-158)."""

import dataclasses

import pytest

from esa_pose_estimation_tpu.utils import config as cfg_mod


class TestLoadYaml:
    def test_nested_stage_dicts_become_dataclasses(self, tmp_path):
        p = tmp_path / 'model.yaml'
        p.write_text(
            'num_keypoints: 11\n'
            'with_cbam: false\n'
            'stage2:\n'
            '  num_modules: 1\n'
            '  num_branches: 2\n'
            '  num_blocks: [1, 1]\n'
            '  num_channels: [8, 16]\n')
        cfg = cfg_mod.load_yaml(str(p))
        assert cfg.num_keypoints == 11 and cfg.with_cbam is False
        # under PEP 563 field annotations are strings; the loader must
        # still reconstruct nested dataclasses (a raw dict here is
        # unhashable and explodes only later as a jit static-arg error)
        assert isinstance(cfg.stage2, cfg_mod.StageConfig)
        assert cfg.stage2.num_channels == (8, 16)
        hash(cfg)  # frozen + fully reconstructed -> usable as static arg

    def test_lists_become_tuples(self, tmp_path):
        p = tmp_path / 'train.yaml'
        p.write_text('lr_boundaries: [10, 20]\nbatch_size: 8\n')
        cfg = cfg_mod.load_yaml(str(p), cfg_mod.TrainConfig)
        assert cfg.lr_boundaries == (10, 20) and cfg.batch_size == 8
        hash(cfg)


class TestApplyOverrides:
    def test_scalar_and_nested(self):
        cfg = cfg_mod.hrnet_tiny()
        out = cfg_mod.apply_overrides(
            cfg, ['num_keypoints=9', 'stage2.num_modules=2'])
        assert out.num_keypoints == 9 and out.stage2.num_modules == 2
        assert isinstance(out.stage2, cfg_mod.StageConfig)
        hash(out)

    @pytest.mark.parametrize('val,expect', [
        ('false', False), ('False', False), ('0', False),
        ('true', True), ('1', True), ('yes', True)])
    def test_bool_spellings(self, val, expect):
        out = cfg_mod.apply_overrides(cfg_mod.hrnet_tiny(),
                                      [f'with_cbam={val}'])
        assert out.with_cbam is expect

    def test_scalar_for_tuple_field(self):
        out = cfg_mod.apply_overrides(cfg_mod.TrainConfig(),
                                      ['lr_boundaries=80'])
        assert out.lr_boundaries == (80,)
        out2 = cfg_mod.apply_overrides(cfg_mod.TrainConfig(),
                                       ['lr_boundaries=(24, 30, 40)'])
        assert out2.lr_boundaries == (24, 30, 40)

    def test_errors_name_the_override(self):
        with pytest.raises(ValueError, match='no_such_key'):
            cfg_mod.apply_overrides(cfg_mod.TrainConfig(),
                                    ['no_such_key=1'])
        with pytest.raises(ValueError, match='with_cbam'):
            cfg_mod.apply_overrides(cfg_mod.hrnet_tiny(),
                                    ['with_cbam=maybe'])
        with pytest.raises(ValueError, match='batch_size'):
            cfg_mod.apply_overrides(cfg_mod.TrainConfig(),
                                    ['batch_size=notanumber'])
        with pytest.raises(ValueError, match='key=value'):
            cfg_mod.apply_overrides(cfg_mod.TrainConfig(), ['batch_size'])

    def test_string_field_taken_verbatim(self):
        out = cfg_mod.apply_overrides(cfg_mod.TrainConfig(),
                                      ['compute_dtype=float32'])
        assert out.compute_dtype == 'float32'

    def test_original_untouched(self):
        cfg = cfg_mod.TrainConfig()
        cfg_mod.apply_overrides(cfg, ['batch_size=2'])
        assert cfg.batch_size == dataclasses.fields(
            cfg_mod.TrainConfig)[0].default
