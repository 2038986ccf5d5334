"""Pure, Ray-free kernels. Every semantic the pipeline must preserve
byte-for-byte lives here exactly once; the Ray stages and the test oracle
both call these functions, so distribution cannot change results."""
