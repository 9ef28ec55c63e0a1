/* Generate reference serialization byte vectors for parity tests.
 * Replays the FIXTURES.md §A golden sequences through the reference C
 * library and dumps each sa_serialize_* buffer to a file. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "cm_sketch.h"
#include "p2.h"
#include "running_stats.h"
#include "time_series.h"
#include "matrix.h"

static void dump(const char *name, const char *buf, size_t len) {
  char path[256];
  snprintf(path, sizeof path, "%s/%s.bin", OUTDIR, name);
  FILE *f = fopen(path, "wb");
  fwrite(buf, 1, len, f);
  fclose(f);
  printf("%s %zu\n", name, len);
}

int main(void) {
  size_t len;
  char *buf;

  /* running stats: 1..10 */
  sa_running_stats rs;
  sa_init_running_stats(&rs);
  for (int i = 1; i <= 10; ++i) sa_add_running_stats(&rs, i);
  buf = sa_serialize_running_stats(&rs, &len);
  dump("running_stats_1to10", buf, len); free(buf);

  /* p2 quantile p=0.5 and histogram b=4 on the paper's 20 observations */
  double data[20] = {0.02,0.15,0.74,3.39,0.83,22.37,10.15,15.43,38.62,15.92,
                     34.60,10.28,1.47,0.40,0.05,11.39,0.27,0.42,0.09,11.37};
  sa_p2_quantile *q = sa_create_p2_quantile(0.5);
  for (int i = 0; i < 20; ++i) sa_add_p2_quantile(q, data[i]);
  buf = sa_serialize_p2_quantile(q, &len);
  dump("p2_quantile_golden", buf, len); free(buf); sa_destroy_p2_quantile(q);

  sa_p2_histogram *h = sa_create_p2_histogram(4);
  for (int i = 0; i < 20; ++i) sa_add_p2_histogram(h, data[i]);
  buf = sa_serialize_p2_histogram(h, &len);
  dump("p2_histogram_golden", buf, len); free(buf); sa_destroy_p2_histogram(h);

  /* CMS eps=0.1 delta=0.1, the test.lua sequence incl. number key 2 */
  sa_cm_sketch *cms = sa_create_cms(0.1, 0.1);
  sa_update_cms(cms, "a", 1, -10);
  sa_update_cms(cms, "c", 1, 6);
  sa_update_cms(cms, "a", 1, 1);
  sa_update_cms(cms, "b", 1, 2);
  sa_update_cms(cms, "c", 1, -3);
  double two = 2.0;
  sa_update_cms(cms, &two, sizeof two, 1);
  sa_update_cms(cms, "c", 1, -4);
  buf = sa_serialize_cms(cms, &len);
  dump("cms_golden", buf, len); free(buf); sa_destroy_cms(cms);

  /* time series: rows=17 ns_per_row=1, MP golden data */
  int mp_data[17] = {132,161,144,145,31,44,47,26,232,236,254,262,339,360,313,340,1};
  sa_time_series_int *ts = sa_create_time_series_int(17, 1);
  for (int i = 0; i < 17; ++i) sa_add_time_series_int(ts, i, mp_data[i]);
  buf = sa_serialize_time_series_int(ts, &len);
  dump("time_series_golden", buf, len); free(buf); sa_destroy_time_series_int(ts);

  /* int matrix 4x4 pcc golden rows */
  int rows_data[4][4] = {{1,2,5,10},{0,1,2,3},{-1,0,7,26},{1,2,3,4}};
  sa_matrix_int *m = sa_create_matrix_int(4, 4);
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c)
      sa_set_matrix_int(m, r, c, rows_data[r][c]);
  buf = sa_serialize_matrix_int(m, &len);
  dump("matrix_int_golden", buf, len); free(buf); sa_destroy_matrix_int(m);

  return 0;
}
