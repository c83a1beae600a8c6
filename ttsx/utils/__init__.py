from ttsx.utils.check_file_sizes import check_file_sizes
from ttsx.utils.plot_utils import (
    trend_figure, segment_figure, drift_figure, save_html)
