import faulthandler; faulthandler.dump_traceback_later(60)
import runpy, sys
sys.argv = ['benches/sort_bench.py', '--rows', '4096', '--cols', '3']
runpy.run_path('benches/sort_bench.py', run_name='__main__')
