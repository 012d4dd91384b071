"""Plot CLI: kind detection + end-to-end figure generation."""

import csv
import os

import pytest

from abx_tpu.cli.plot import detect_kind, main, remove_outliers


def test_detect_kind():
    assert detect_kind([{'time': '1.0', 'name': 'x'}]) == 'trajectory'
    assert detect_kind([{'step': '1', 'total': '2.0'}]) == 'training'
    assert detect_kind([{'h3_rmsd': '1.0'}]) == 'metrics'
    assert detect_kind([{'pll': '-2.5'}]) == 'metrics'
    with pytest.raises(SystemExit):
        detect_kind([{'foo': '1'}])


def test_remove_outliers():
    data = [1.0, 1.1, 0.9, 1.05, 0.95, 100.0]
    kept = remove_outliers(data)
    assert 100.0 not in kept and len(kept) == 5
    assert remove_outliers([1.0, 2.0]) == [1.0, 2.0]  # too few: untouched


def test_end_to_end_png(tmp_path):
    path = tmp_path / 'results.csv'
    with open(path, 'w', newline='', encoding='utf-8') as f:
        w = csv.DictWriter(f, fieldnames=['name', 'h3_rmsd', 'h3_aar'])
        w.writeheader()
        for i in range(5):
            w.writerow({'name': f'c{i}', 'h3_rmsd': 1.0 + 0.1 * i,
                        'h3_aar': 0.5})
    main(['--csv', str(path)])
    assert os.path.exists(tmp_path / 'results.png')
