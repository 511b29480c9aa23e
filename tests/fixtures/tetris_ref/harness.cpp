// Golden-trajectory generator: compiles the ACTUAL reference multi-
// material demo (/root/reference/tetris.cpp — its advance()/add_object()
// are included verbatim, its GUI main() renamed away via the #define)
// and dumps particle positions + material type at frames 0/5/10/20/40
// (frame = int(frame_dt/dt) = 26 substeps of dt = 60e-4/160, exactly the
// reference main loop's visualize cadence, tetris.cpp:141-153).
// The 7 tetromino pieces cycle type i%3: 0 elastic / 1 plastic(snow) /
// 2 liquid (tetris.cpp:49-53,98-113 is the per-type dispatch this golden
// pins). Output format:
//   FRAME <k> <n_particles>
//   <x> <y> <type>       (one line per particle, %.9g)
// Build + run (shares the mpm88 fixture's taichi.h shim):
//   g++ -O2 -std=c++17 -I../mpm88_ref harness.cpp -o harness
//   ./harness > golden.txt
#include <cstdio>

#define main taichi_reference_main_unused
#include "/root/reference/tetris.cpp"
#undef main

static void dump(int frame) {
  std::printf("FRAME %d %d\n", frame, (int)particles.size());
  for (auto &p : particles)
    std::printf("%.9g %.9g %d\n", p.x.x, p.x.y, p.type);
}

int main() {
  particles.clear();
  for (int i = 0; i < 7; i++)
    add_object(Vector2(0.3 + i % 2 * 0.3, 0.2 + i * 0.08), i % 3, i);
  dump(0);
  int sub = (int)(frame_dt / dt);  // 26
  for (int f = 1; f <= 40; f++) {
    for (int s = 0; s < sub; s++) advance(dt);
    if (f == 5 || f == 10 || f == 20 || f == 40) dump(f);
  }
  return 0;
}
