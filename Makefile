# Convenience targets; all commands also work directly.

.PHONY: test bench design eval dryrun

test:
	python -m pytest tests/ -q

bench:
	python bench.py

design:
	python -m abx_tpu.cli.design --pdb_file testdata/6ct7_H_L_S.pdb \
	    --output_dir out --num_samples 4 --tiny --num_t 10

eval:
	python -m abx_tpu.cli.eval_metric --data_dir out/design

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
