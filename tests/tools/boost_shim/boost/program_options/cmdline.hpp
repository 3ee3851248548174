// Test-only shim: forwards to the single program_options shim header.
#include "../program_options.hpp"
